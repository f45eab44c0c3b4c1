"""Per-class P/R/F1 fold (operators/evaluation.py::classification_report):
hand values, never-predicted class NULL precision, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.evaluation import (
    classification_report,
    classification_report_oracle_sql,
)

MICRO = 1_000_000

PAIRS = [
    ("en", "en"), ("en", "en"), ("en", "en"), ("en", "fr"),
    ("fr", "fr"), ("fr", "fr"), ("fr", "en"),
    ("de", "en"),
    ("zh", "en"),
]


def _df(spark):
    return spark.createDataFrame(PAIRS, "t string, p string")


def test_report(spark):
    rows = {r["class"]: r for r in classification_report(
        _df(spark), "t", "p").collect()}
    en = rows["en"]
    assert (en["support"], en["predicted"], en["tp"]) == (4, 6, 3)
    assert en["precision_micro"] == 3 * MICRO // 6
    assert en["recall_micro"] == 3 * MICRO // 4
    assert en["f1_micro"] == 2 * 3 * MICRO // 10
    fr = rows["fr"]
    assert fr["f1_micro"] == 2 * 2 * MICRO // 6
    de = rows["de"]  # never predicted: precision undefined, not zero
    assert de["precision_micro"] is None
    assert de["recall_micro"] == 0 and de["f1_micro"] == 0
    assert set(rows) == {"en", "fr", "de", "zh"}


def test_matches_duckdb_oracle(spark):
    labeled_sql = " UNION ALL ".join(
        f"SELECT '{t}' AS t, '{p}' AS p" for t, p in PAIRS)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        classification_report_oracle_sql(labeled_sql)).fetchall())
    got = sorted(tuple(r) for r in classification_report(
        _df(spark), "t", "p").collect())
    assert got == want and len(got) == 4
