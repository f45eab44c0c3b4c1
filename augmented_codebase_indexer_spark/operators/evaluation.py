"""Evaluation operators (J6 / A6 analogs, ``services/evaluation_service.py``).

* ``triple_pr`` — inner join predicted vs golden triples → precision/recall
  (the P/R ≥ 0.95 acceptance gate of BASELINE.json, mirroring the
  retrieved×relevant intersection at ``evaluation_service.py:125-136``).
* ``recall_at_k`` / ``mrr`` — ranked-retrieval quality over a golden set
  (``evaluation_service.py:125-161``; the reference warns below 0.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TRIPLE_KEY = ["subj_id", "pred", "obj_id", "url"]


def triple_pr(predicted: DataFrame, golden: DataFrame, key: list[str] | None = None) -> dict:
    key = key or TRIPLE_KEY
    p = predicted.select(*key).distinct().cache()
    g = golden.select(*key).distinct().cache()
    n_p, n_g = p.count(), g.count()
    tp = p.join(g, key, "inner").count()
    p.unpersist(), g.unpersist()
    return {
        "predicted": n_p,
        "golden": n_g,
        "true_positives": tp,
        "precision": tp / n_p if n_p else 0.0,
        "recall": tp / n_g if n_g else 0.0,
    }


def recall_at_k(ranked: DataFrame, relevant: DataFrame, k: int = 10,
                query_col: str = "query_id", item_col: str = "item_id") -> DataFrame:
    """ranked(query_id, item_id, rank) × relevant(query_id, item_id) →
    (query_id, recall_at_k)."""
    topk = ranked.filter(F.col("rank") <= k)
    hits = topk.join(relevant, [query_col, item_col]).groupBy(query_col).agg(
        F.count("*").alias("hits")
    )
    totals = relevant.groupBy(query_col).agg(F.count("*").alias("n_rel"))
    return totals.join(hits, query_col, "left").select(
        query_col,
        F.round(F.coalesce(F.col("hits"), F.lit(0)) / F.col("n_rel"), 6).alias("recall_at_k"),
    )


def mrr(ranked: DataFrame, relevant: DataFrame,
        query_col: str = "query_id", item_col: str = "item_id") -> DataFrame:
    """→ (query_id, rr): reciprocal of the first relevant rank (W4 analog)."""
    first = ranked.join(relevant, [query_col, item_col]).groupBy(query_col).agg(
        F.min("rank").alias("first_rank")
    )
    return first.select(query_col, F.round(1.0 / F.col("first_rank"), 6).alias("rr"))


def classification_report(
    labeled: DataFrame, truth_col: str, pred_col: str
) -> DataFrame:
    """Per-class P/R/F1 over (truth, pred) label pairs — the standard
    multi-class evaluation fold (one row per class appearing in truth
    OR predictions): (class, support, predicted, tp, precision_micro,
    recall_micro, f1_micro).

    Exact-integer discipline: F1 uses the identity
    ``F1 = 2·tp / (2·tp + fp + fn)`` so no float P/R composition ever
    exists; a class never predicted has precision NULL (0/0 stays
    undefined, not 0), a class absent from truth has recall NULL.

    Scale shape: ONE data-sized (truth, pred) groupBy (map-side
    combined to ≤ classes² rows); every fold after runs at class
    vocabulary grain. Used as the resubstitution-fit diagnostic for
    the trained LID (`operators/langid.py`) and any other in-pipeline
    classifier."""
    pairs = (
        labeled.select(F.col(truth_col).alias("t"),
                       F.col(pred_col).alias("p"))
        .groupBy("t", "p")
        .agg(F.count("*").cast("long").alias("n"))
    )
    support = pairs.groupBy(F.col("t").alias("class")).agg(
        F.sum("n").alias("support"))
    predicted = pairs.groupBy(F.col("p").alias("class")).agg(
        F.sum("n").alias("predicted"))
    tp = (
        pairs.filter(F.col("t") == F.col("p"))
        .select(F.col("t").alias("class"), F.col("n").alias("tp"))
    )
    return (
        support.join(predicted, "class", "full_outer")
        .join(tp, "class", "left")
        .selectExpr(
            "class",
            "CAST(coalesce(support, 0) AS BIGINT) AS support",
            "CAST(coalesce(predicted, 0) AS BIGINT) AS predicted",
            "CAST(coalesce(tp, 0) AS BIGINT) AS tp",
        )
        .selectExpr(
            "class", "support", "predicted", "tp",
            "CASE WHEN predicted = 0 THEN NULL"
            " ELSE tp * 1000000 DIV predicted END AS precision_micro",
            "CASE WHEN support = 0 THEN NULL"
            " ELSE tp * 1000000 DIV support END AS recall_micro",
            "CASE WHEN support + predicted = 0 THEN NULL"
            " ELSE 2 * tp * 1000000 DIV (support + predicted)"
            " END AS f1_micro",
        )
    )


def classification_report_oracle_sql(labeled_sql: str) -> str:
    """DuckDB mirror of :func:`classification_report`; ``labeled_sql``
    must expose columns (t, p)."""
    return f"""
    WITH pairs AS MATERIALIZED (
      SELECT t, p, CAST(count(*) AS BIGINT) AS n
      FROM ({labeled_sql}) GROUP BY t, p),
    support AS (SELECT t AS class, CAST(sum(n) AS BIGINT) AS support
                FROM pairs GROUP BY t),
    predicted AS (SELECT p AS class, CAST(sum(n) AS BIGINT) AS predicted
                  FROM pairs GROUP BY p),
    tp AS (SELECT t AS class, n AS tp FROM pairs WHERE t = p),
    m AS (
      SELECT coalesce(s.class, pr.class) AS class,
             CAST(coalesce(s.support, 0) AS BIGINT) AS support,
             CAST(coalesce(pr.predicted, 0) AS BIGINT) AS predicted
      FROM support s FULL OUTER JOIN predicted pr ON s.class = pr.class)
    SELECT m.class, m.support, m.predicted,
           CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
           CASE WHEN m.predicted = 0 THEN NULL
                ELSE coalesce(tp.tp, 0) * 1000000 // m.predicted
           END AS precision_micro,
           CASE WHEN m.support = 0 THEN NULL
                ELSE coalesce(tp.tp, 0) * 1000000 // m.support
           END AS recall_micro,
           CASE WHEN m.support + m.predicted = 0 THEN NULL
                ELSE 2 * coalesce(tp.tp, 0) * 1000000
                     // (m.support + m.predicted)
           END AS f1_micro
    FROM m LEFT JOIN tp ON m.class = tp.class
    """
