"""Score calibration (operators/calibration.py): fixed bucket edges,
top-edge clamp, exact rates, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.calibration import (
    MICRO,
    score_calibration,
    score_calibration_oracle_sql,
)

ROWS = [
    (50_000, True), (50_000, False),        # bucket 0: rate 1/2
    (250_000, False), (260_000, False),     # bucket 2: rate 0
    (999_999, True), (1_000_000, True),     # both clamp into bucket 9
]


def _df(spark):
    return spark.createDataFrame(ROWS, "score long, label boolean")


def test_buckets_and_rates(spark):
    rows = {r["bucket"]: r
            for r in score_calibration(_df(spark), "score", "label").collect()}
    assert set(rows) == {0, 2, 9}
    assert (rows[0]["n"], rows[0]["positives"]) == (2, 1)
    assert rows[0]["rate_micro"] == MICRO // 2
    assert (rows[0]["lo_micro"], rows[0]["hi_micro"]) == (0, 100_000)
    assert rows[2]["rate_micro"] == 0
    assert (rows[9]["n"], rows[9]["rate_micro"]) == (2, MICRO)  # clamp


def test_matches_duckdb_oracle(spark):
    s_sql = " UNION ALL ".join(
        f"SELECT {s} AS score, {'true' if y else 'false'} AS label"
        for s, y in ROWS)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        score_calibration_oracle_sql(s_sql)).fetchall())
    got = sorted(tuple(r) for r in score_calibration(
        _df(spark), "score", "label").collect())
    assert got == want
