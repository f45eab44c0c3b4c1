"""Score calibration fold — does a heuristic score actually predict the
label it gates on? Fixed-bucket calibration curves in exact integers.

Every curation threshold (quality ≥ X, LM perplexity ≤ Y) embeds the
claim "this score separates the classes". The calibration fold checks
the claim the way the calibration literature draws reliability
diagrams (Zadrozny & Elkan KDD'02 — the histogram-binning view):
bucket the score into K FIXED-WIDTH bins over [0, 1e6] micro units
(fixed edges, not ntile — quantile bins make bucket membership depend
on the whole distribution and turn the gate into a moving target),
and report per bin the row count and the exact micro label rate. A
score that works shows a monotone rate across bins; a flat curve
means the threshold is cargo cult — measured, not assumed.

Scale shape: one projection (bucket arithmetic in codegen) + one
K-row aggregate with map-side combine. Composable over any
(score, label) pair the pipeline already computes.

Reference anchor: the reference tunes its search-score cutoffs by
inspecting score histograms (`services/search_service.py` debug
output); this is the label-conditioned form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def score_calibration(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """scored(score ∈ [0, 1e6] micro, label boolean) → one row per
    non-empty bucket: (bucket, lo_micro, hi_micro, n, positives,
    rate_micro)."""
    b = (f"least(CAST({score_col} AS BIGINT) * {n_buckets}"
         f" DIV {MICRO}, {n_buckets - 1})")
    return (
        scored.selectExpr(
            f"{b} AS bucket",
            f"CAST({label_col} AS INT) AS _y",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_y").cast("long").alias("positives"),
        )
        .selectExpr(
            "bucket",
            f"bucket * {MICRO} DIV {n_buckets} AS lo_micro",
            f"(bucket + 1) * {MICRO} DIV {n_buckets} AS hi_micro",
            "n", "positives",
            f"positives * {MICRO} DIV n AS rate_micro",
        )
    )


def score_calibration_oracle_sql(
    scored_sql: str, n_buckets: int = 10
) -> str:
    """DuckDB mirror over a relation exposing (score, label)."""
    b = (f"least(CAST(score AS BIGINT) * {n_buckets}"
         f" // {MICRO}, {n_buckets - 1})")
    return f"""
    WITH s AS (SELECT {b} AS bucket,
                      CASE WHEN label THEN 1 ELSE 0 END AS _y
               FROM ({scored_sql})),
    agg AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(_y) AS BIGINT) AS positives
            FROM s GROUP BY bucket)
    SELECT bucket, bucket * {MICRO} // {n_buckets} AS lo_micro,
           (bucket + 1) * {MICRO} // {n_buckets} AS hi_micro,
           n, positives, positives * {MICRO} // n AS rate_micro
    FROM agg
    """
