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


def test_auc_hand_values_with_ties(spark):
    from augmented_codebase_indexer_spark.operators.calibration import (
        ranking_auc,
    )

    # pos scores {3, 2}, neg {2, 1}: midrank AUC = 0.875
    df = spark.createDataFrame(
        [(3, True), (2, True), (2, False), (1, False)],
        "score long, label boolean")
    r = ranking_auc(df, "score", "label").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (2, 2)
    assert r["u2"] == 7
    assert r["auc_micro"] == 7 * MICRO // 8
    # perfect separation and degenerate single-class input
    perfect = spark.createDataFrame(
        [(9, True), (1, False)], "score long, label boolean")
    assert ranking_auc(perfect, "score", "label").collect()[0][
        "auc_micro"] == MICRO
    onesided = spark.createDataFrame(
        [(9, True), (1, True)], "score long, label boolean")
    assert ranking_auc(onesided, "score", "label").collect()[0][
        "auc_micro"] is None


def test_auc_matches_duckdb_oracle(spark):
    import duckdb as _dd

    from augmented_codebase_indexer_spark.operators.calibration import (
        ranking_auc,
        ranking_auc_oracle_sql,
    )

    rows = [(s, y) for s, y in
            [(10, True), (10, False), (7, True), (7, True), (7, False),
             (3, False), (3, False), (1, True)]]
    s_sql = " UNION ALL ".join(
        f"SELECT {s} AS score, {'true' if y else 'false'} AS label"
        for s, y in rows)
    df = spark.createDataFrame(rows, "score long, label boolean")
    want = _dd.connect().execute(ranking_auc_oracle_sql(s_sql)).fetchall()[0]
    got = tuple(ranking_auc(df, "score", "label").collect()[0])
    assert got == tuple(want)
