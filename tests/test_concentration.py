"""Concentration metrics (operators/concentration.py): uniform = 0,
one-key dominance = (n-1)/n, effective counts, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.concentration import (
    MICRO,
    concentration,
    concentration_oracle_sql,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "key string, w long")
    return concentration(df).collect()[0]


def test_uniform_is_zero(spark):
    r = _run(spark, [("a", 5), ("b", 5), ("c", 5), ("d", 5)])
    assert r["gini_micro"] == 0
    assert r["effective_keys_micro"] == 4 * MICRO
    assert r["top_share_micro"] == MICRO // 4


def test_total_dominance(spark):
    r = _run(spark, [("a", 0), ("b", 0), ("c", 0), ("d", 12)])
    assert r["gini_micro"] == 750_000          # (n-1)/n
    assert r["effective_keys_micro"] == MICRO  # one effective source
    assert r["top_share_micro"] == MICRO


def test_degenerate_single_key(spark):
    r = _run(spark, [("a", 7)])
    assert r["gini_micro"] is None
    assert r["effective_keys_micro"] == MICRO


def test_matches_duckdb_oracle(spark):
    rows = [("a", 1), ("b", 2), ("c", 2), ("d", 10), ("e", 0)]
    w_sql = " UNION ALL ".join(
        f"SELECT '{k}' AS key, {w} AS w" for k, w in rows)
    want = duckdb.connect().execute(
        concentration_oracle_sql(w_sql)).fetchall()[0]
    got = tuple(_run(spark, rows))
    assert got == tuple(want)
