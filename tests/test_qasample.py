"""Stratified hash sampling (operators/qasample.py): exact quota,
determinism across runs, small-stratum passthrough, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.qasample import (
    stratified_sample,
    stratified_sample_oracle_sql,
)

FACTS = [(f"s{i}", "works_at", f"o{i % 4}") for i in range(10)] + [
    ("s1", "lives_in", "paris"), ("s2", "lives_in", "rome"),
]


def _df(spark):
    return spark.createDataFrame(FACTS, "subj string, pred string, obj string")


def test_quota_and_determinism(spark):
    out1 = sorted(tuple(r) for r in stratified_sample(
        _df(spark), ["pred"], ["subj", "pred", "obj"], k=3).collect())
    out2 = sorted(tuple(r) for r in stratified_sample(
        _df(spark), ["pred"], ["subj", "pred", "obj"], k=3).collect())
    assert out1 == out2  # no RNG state anywhere
    by_pred = {}
    for row in out1:
        by_pred.setdefault(row[1], []).append(row)
    assert len(by_pred["works_at"]) == 3      # exact quota
    assert len(by_pred["lives_in"]) == 2      # small stratum: all rows
    assert all(r[-1] <= 3 for r in out1)


def test_matches_duckdb_oracle(spark):
    f_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in FACTS)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        stratified_sample_oracle_sql(
            f_sql, ["pred"], ["subj", "pred", "obj"], k=3)).fetchall())
    got = sorted(tuple(r) for r in stratified_sample(
        _df(spark), ["pred"], ["subj", "pred", "obj"], k=3).collect())
    assert got == want
