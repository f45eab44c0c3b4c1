"""Skip-gram pairs over walk corpora (operators/walks.py::skipgram_pairs):
window band semantics, symmetry, count aggregation, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.walks import (
    deterministic_walks,
    skipgram_oracle_sql,
    skipgram_pairs,
)

EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
    ("a", "c"), ("b", "d"),
]


def _edges(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def _hand_pairs(spark, window):
    walks = deterministic_walks(_edges(spark), walk_len=3, walks_per_node=2)
    rows = [
        (r["start_node"], r["walk"], r["step"], r["node"])
        for r in walks.collect()
    ]
    cnt = {}
    for sn, wk, sa, na in rows:
        for sn2, wk2, sb, nb in rows:
            if (sn, wk) == (sn2, wk2) and sa != sb and abs(sa - sb) <= window:
                cnt[(na, nb)] = cnt.get((na, nb), 0) + 1
    return sorted((a, b, n) for (a, b), n in cnt.items())


def test_matches_hand_count_and_symmetry(spark):
    walks = deterministic_walks(_edges(spark), walk_len=3, walks_per_node=2)
    got = sorted(
        tuple(r) for r in skipgram_pairs(walks, window=2).collect()
    )
    assert got == _hand_pairs(spark, 2)
    # symmetry: every (a, b, n) has its (b, a, n) mirror
    asdict = {(a, b): n for a, b, n in got}
    assert all(asdict[(b, a)] == n for (a, b), n in asdict.items())
    # window=1 is a strict subset with smaller-or-equal counts
    w1 = {(a, b): n for a, b, n in (
        tuple(r) for r in skipgram_pairs(walks, window=1).collect())}
    assert all(w1[k] <= asdict[k] for k in w1)


def test_matches_duckdb_oracle(spark):
    edges_sql = " UNION ALL ".join(
        f"SELECT '{a}' AS src, '{b}' AS dst" for a, b in EDGES
    )
    walks = deterministic_walks(_edges(spark), walk_len=3, walks_per_node=2)
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        skipgram_oracle_sql(edges_sql, window=2, walk_len=3,
                            walks_per_node=2)).fetchall())
    got = sorted(tuple(r) for r in skipgram_pairs(walks, window=2).collect())
    assert got == want and len(got) > 0
