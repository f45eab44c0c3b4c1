"""Fixed-round Bellman-Ford (operators/sssp.py): planted weighted
graph, python-mirror parity at two round counts, parallel-edge min,
horizon semantics, multi-seed min, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.sssp import (
    shortest_paths,
    shortest_paths_oracle_sql,
    shortest_paths_py,
)

# weighted digraph: the 2-hop path a→b→c (1+1=2) beats the direct
# a→c edge (5); d hangs 3 hops out; z is unreachable from a.
EDGES = [
    ("a", "b", 1), ("b", "c", 1), ("a", "c", 5),
    ("c", "d", 2), ("z", "a", 1), ("a", "b", 7),  # parallel edge loses
]
SEEDS = ["a"]


def _dfs(spark, edges=EDGES, seeds=SEEDS):
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return e, s


def test_planted_distances(spark):
    e, s = _dfs(spark)
    got = {r["node"]: r["dist"] for r in shortest_paths(e, s, rounds=4).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 4}  # z absent


def test_horizon_semantics(spark):
    # rounds=1: only direct edges relax — c takes the 5-edge, d unseen
    e, s = _dfs(spark)
    got = {r["node"]: r["dist"] for r in shortest_paths(e, s, rounds=1).collect()}
    assert got == {"a": 0, "b": 1, "c": 5}


def test_python_mirror(spark):
    e, s = _dfs(spark)
    for rounds in (1, 2, 4):
        got = sorted(
            (r["node"], r["dist"])
            for r in shortest_paths(e, s, rounds=rounds).collect()
        )
        assert got == shortest_paths_py(EDGES, SEEDS, rounds)


def test_multi_seed_takes_min(spark):
    e, s = _dfs(spark, seeds=["a", "c"])
    got = {r["node"]: r["dist"] for r in shortest_paths(e, s, rounds=4).collect()}
    assert got["c"] == 0 and got["d"] == 2


def test_validation(spark):
    e, s = _dfs(spark)
    with pytest.raises(ValueError):
        shortest_paths(e, s, rounds=0)


def test_matches_duckdb_oracle(spark):
    e, s = _dfs(spark)
    e_sql = " UNION ALL ".join(
        f"SELECT '{a}' AS src, '{b}' AS dst, {w} AS w" for a, b, w in EDGES)
    s_sql = " UNION ALL ".join(f"SELECT '{x}' AS node" for x in SEEDS)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(shortest_paths_oracle_sql(e_sql, s_sql, rounds=4))
        .fetchall()
    )
    got = sorted(tuple(r) for r in shortest_paths(e, s, rounds=4).collect())
    assert got == want and len(got) == 4
