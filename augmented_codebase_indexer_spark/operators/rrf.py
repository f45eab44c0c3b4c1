"""Reciprocal-rank fusion (J5/A4 analogs, ``services/rrf_fuser.py:34-67``).

Each backend contributes a ranked list; fused score = Σ 1/(k + rank_i),
k = 60 (the reference default, ``rrf_fuser.py:26``). Deterministic
tie-break (-score, id) mirrors ``rrf_fuser.py:66``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60


def rank_by(df: DataFrame, id_col: str, score_col: str, backend: str) -> DataFrame:
    """(id, score) → (id, backend, rank) with 1-based rank, ties broken by id
    (W2 analog)."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return df.select(
        F.col(id_col).alias("item_id"),
        F.lit(backend).alias("backend"),
        F.row_number().over(w).alias("rank"),
    )


def rrf_fuse(ranked_lists: list[DataFrame], k: int = RRF_K, limit: int | None = None) -> DataFrame:
    """union of (item_id, backend, rank) → (item_id, rrf_score) ordered by
    (-score, item_id)."""
    allr = ranked_lists[0]
    for other in ranked_lists[1:]:
        allr = allr.unionByName(other)
    fused = (
        allr.groupBy("item_id")
        .agg(F.round(F.sum(1.0 / (F.lit(k) + F.col("rank"))), 6).alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc("item_id"))
    )
    return fused.limit(limit) if limit else fused
