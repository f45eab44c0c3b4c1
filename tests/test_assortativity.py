"""Degree assortativity (operators/graphalgs.py::assortativity): the
star is exactly -1, a regular graph is NULL, DuckDB parity on a mixed
graph."""

import duckdb

from augmented_codebase_indexer_spark.operators.graphalgs import (
    assortativity,
    assortativity_oracle_sql,
)

MICRO = 1_000_000


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return assortativity(df).collect()[0]


def test_star_is_perfectly_disassortative(spark):
    r = _run(spark, [("c", "x"), ("c", "y"), ("c", "z")])
    assert (r["m_edges"], r["s_jk"], r["s_sum"], r["s_sq"]) == (3, 9, 12, 30)
    assert r["assortativity_micro"] == -MICRO


def test_regular_graph_is_null(spark):
    # C4 cycle: every degree 2 -> zero variance -> undefined, NULL
    r = _run(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    assert r["assortativity_micro"] is None


def test_matches_duckdb_oracle(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("c", "e"),
             ("e", "f"), ("b", "e"), ("a", "a"), ("b", "a")]
    e_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS src, '{d}' AS dst" for s, d in edges)
    want = duckdb.connect().execute(
        assortativity_oracle_sql(e_sql)).fetchall()[0]
    got = tuple(_run(spark, edges))
    assert got == tuple(want)
