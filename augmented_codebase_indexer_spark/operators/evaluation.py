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
