"""Hybrid search read path (SURVEY.md §3.2 — the `aci search` analog).

Two candidate generators run as independent DataFrame branches (the
reference runs them concurrently with asyncio.gather; in Spark both branches
of the union evaluate in one job):

  * pattern branch — substring/regex match over document text with a
    coverage-ratio score (grep analog, ``grep_searcher.py:244-311``)
  * vector branch — embedding cosine against a deterministic hash-embedded
    query (Qdrant ANN analog), over-fetched ×5 (O3,
    ``search_service.py:270-273``)

then: score normalization to the vector scale (C9,
``search_utils.py:83-128``) → unionByName (U2) → location dedup keep-max
(W1) → deterministic sort + limit (O1/O2). RRF fusion
(``operators/rrf.py``) is the alternative merge the reference uses on the
graph path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

import pandas as pd

from ..functions.hashing import hash_embedding
from ..operators.ann import cosine_col


@F.pandas_udf(ArrayType(FloatType()))
def hash_embed_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda t: hash_embedding(t or "", 64))


def pattern_candidates(docs: DataFrame, query: str, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Documents containing the query tokens; score = fraction of query
    tokens present (simple coverage — deterministic, JVM-side)."""
    toks = [t for t in query.lower().split() if t]
    hits = sum(
        F.when(F.col(text_col).contains(t), F.lit(1.0)).otherwise(F.lit(0.0)) for t in toks
    )
    return (
        docs.select(F.col(id_col).alias("item_id"),
                    (hits / F.lit(float(len(toks)))).alias("score"))
        .filter(F.col("score") > 0)
        .withColumn("backend", F.lit("pattern"))
    )


def vector_candidates(docs: DataFrame, query: str, k: int, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Cosine of hash-embeddings (the hermetic embedder C11) — over-fetch
    ×5 then cut (recall_multiplier, ``search_service.py:63-76``)."""
    qvec = F.array(*[F.lit(float(x)) for x in hash_embedding(query, 64)])
    scored = docs.select(
        F.col(id_col).alias("item_id"),
        F.round(cosine_col(hash_embed_udf(F.col(text_col)), qvec), 6).alias("score"),
    ).withColumn("backend", F.lit("vector"))
    return scored.orderBy(F.desc("score"), F.asc("item_id")).limit(k * 5)


def hybrid_search(docs: DataFrame, query: str, k: int = 10) -> DataFrame:
    """→ (item_id, score, backend) top-k after normalize+union+dedup."""
    pat = pattern_candidates(docs, query)
    vec = vector_candidates(docs, query, k)
    # C9: scale pattern scores onto the vector scale (max_vector / max_pattern)
    w_all = Window.partitionBy()
    pat_n = pat.withColumn("__maxp", F.max("score").over(w_all))
    vmax = vec.agg(F.max("score").alias("__maxv"))
    pat_n = pat_n.crossJoin(F.broadcast(vmax)).select(
        "item_id",
        F.round(F.col("score") / F.col("__maxp") * F.col("__maxv"), 6).alias("score"),
        "backend",
    )
    both = pat_n.unionByName(vec)
    # W1: one row per item, keep max score; deterministic backend tie-break
    w = Window.partitionBy("item_id").orderBy(F.desc("score"), F.asc("backend"))
    best = both.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    return best.orderBy(F.desc("score"), F.asc("item_id")).limit(k)
