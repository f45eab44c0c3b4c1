"""Deterministic random walks (operators/walks.py): pure-python mirror
parity, edge-validity, truncation at dangling nodes, determinism across
partitionings, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.functions.hashing import h60
from augmented_codebase_indexer_spark.operators.walks import (
    deterministic_walks,
    walks_oracle_sql,
)

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
    ("d", "a"), ("a", "b"),  # duplicate edge must not bias the choice
    ("e", "e"),              # self-loop dropped → e has no out-edges
    ("x", "sink"),           # sink is dangling: walks truncate there
]


def _df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def _py_walks(edges, walk_len=4, walks_per_node=2, seed="w0"):
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
    adj = {n: sorted(ds) for n, ds in adj.items()}
    rows = []
    for start in adj:
        for w in range(walks_per_node):
            cur = start
            rows.append((start, w, 0, cur))
            for step in range(1, walk_len + 1):
                if cur not in adj:
                    break
                nbrs = adj[cur]
                key = f"{start}#{w}#{seed}#{step}"
                cur = nbrs[h60(key) % len(nbrs)]
                rows.append((start, w, step, cur))
    return sorted(rows)


def test_matches_python_mirror(spark):
    got = sorted(tuple(r) for r in deterministic_walks(_df(spark)).collect())
    assert got == _py_walks(EDGES)


def test_every_hop_is_a_real_edge_and_dangles_truncate(spark):
    rows = deterministic_walks(_df(spark)).collect()
    edge_set = {(s, d) for s, d in EDGES if s != d}
    by_walk = {}
    for r in rows:
        by_walk.setdefault((r["start_node"], r["walk"]), {})[r["step"]] = r["node"]
    for (start, _), path in by_walk.items():
        assert path[0] == start
        for step in range(1, max(path) + 1):
            assert (path[step - 1], path[step]) in edge_set
    # walks reaching 'sink' stop there (sink has no out-edges)
    x_paths = [p for (s, _), p in by_walk.items() if s == "x"]
    assert x_paths and all(max(p) == 1 and p[1] == "sink" for p in x_paths)
    # 'e' only had a self-loop → no out-edges → no walks start there
    assert not any(s == "e" for (s, _), _p in by_walk.items())


def test_deterministic_across_partitionings(spark):
    a = sorted(tuple(r) for r in deterministic_walks(_df(spark)).collect())
    b = sorted(
        tuple(r)
        for r in deterministic_walks(_df(spark).repartition(7)).collect()
    )
    assert a == b


def test_seed_changes_walks(spark):
    a = sorted(tuple(r) for r in deterministic_walks(_df(spark)).collect())
    b = sorted(
        tuple(r) for r in deterministic_walks(_df(spark), seed="w1").collect()
    )
    assert a != b  # different seed, different corpus
    assert len(a) == len(b) or True  # lengths may differ via truncation


def test_duckdb_parity(spark):
    edges_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS src, '{d}' AS dst" for s, d in EDGES
    )
    got = sorted(tuple(r) for r in deterministic_walks(_df(spark)).collect())
    want = sorted(map(tuple, duckdb.connect().execute(
        walks_oracle_sql(edges_sql)).fetchall()))
    assert got == want
