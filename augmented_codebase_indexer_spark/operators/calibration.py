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
from pyspark.sql.window import Window

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


def ranking_auc(
    scored: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact AUC via the Mann–Whitney U statistic with midrank tie
    correction — ONE row: (n_pos, n_neg, u2, auc_micro).

    The threshold-free companion to the calibration curve: AUC is the
    probability a random positive outscores a random negative, and the
    rank-sum identity computes it without enumerating pairs (Hanley &
    McNeil, Radiology '82). Integer discipline: DOUBLED midranks —
    a tie group spanning ranks [lo, hi] contributes ``lo + hi`` per
    member, an integer where the midrank ``(lo+hi)/2`` is not — so

        2U = Σ_pos (lo + hi)  −  n_pos·(n_pos + 1)
        auc_micro = 2U · 1e6 DIV (2 · n_pos · n_neg)

    is BIGINT end-to-end. Degenerate inputs (single class) yield NULL,
    never a division error.

    Scale shape: one (score) aggregate (map-side combined), then the
    cumulative window runs at DISTINCT-SCORE grain — bounded at 1e6+1
    rows by micro quantization, not data-sized — and one global fold.
    Overflow: Σ(lo+hi) ≤ 2N² per positive → safe to N ≈ 2·10^9 rows."""
    g = (
        scored.selectExpr(
            f"CAST({score_col} AS BIGINT) AS s",
            f"CAST({label_col} AS INT) AS _y",
        )
        .groupBy("s")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("_y").cast("long").alias("pos"),
        )
    )
    w = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    ranked = g.select(
        "s", "cnt", "pos",
        F.sum("cnt").over(w).cast("long").alias("hi"),
    ).selectExpr("s", "cnt", "pos", "hi", "hi - cnt + 1 AS lo")
    return ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).cast("long").alias("n_neg"),
        F.sum(F.expr("pos * (lo + hi)")).cast("long").alias("_r2"),
    ).selectExpr(
        "n_pos", "n_neg",
        "_r2 - n_pos * (n_pos + 1) AS u2",
        "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL"
        " ELSE (_r2 - n_pos * (n_pos + 1)) * 1000000"
        " DIV (2 * n_pos * n_neg) END AS auc_micro",
    )


def ranking_auc_oracle_sql(scored_sql: str) -> str:
    """DuckDB mirror over a relation exposing (score, label)."""
    return f"""
    WITH g AS (
      SELECT CAST(score AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
               AS pos
      FROM ({scored_sql}) GROUP BY 1),
    ranked AS (
      SELECT s, cnt, pos,
             CAST(sum(cnt) OVER (ORDER BY s
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
      FROM g),
    fold AS (
      SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg,
             CAST(sum(pos * ((hi - cnt + 1) + hi)) AS BIGINT) AS _r2
      FROM ranked)
    SELECT n_pos, n_neg, _r2 - n_pos * (n_pos + 1) AS u2,
           CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                ELSE (_r2 - n_pos * (n_pos + 1)) * 1000000
                     // (2 * n_pos * n_neg) END AS auc_micro
    FROM fold
    """
