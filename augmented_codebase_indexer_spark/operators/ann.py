"""Similarity search over an embedding column (`array<float>`).

Replaces the reference's Qdrant ANN store (``infrastructure/vector_store/
qdrant.py:126-144``, cosine distance + payload filters) with two tiers:

* ``brute_force_topk`` — exact cosine top-k: query set joined against the
  corpus, dot product via ``F.zip_with`` + ``F.aggregate`` (JVM-side, whole-
  stage-codegen'd; no Python in the hot path), ranked by a window. The
  correctness baseline, and the right answer whenever |queries| is small
  enough to broadcast.
* ``lsh_bucket_topk`` — random-hyperplane (sign-bit) LSH buckets: the scale
  path. Vectors hash to a B-bit signature via deterministic hyperplanes;
  candidates share a signature band; exact cosine re-rank inside buckets.
  Recall < 1 by design — report alongside the exact tier.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_col(a, b):
    # compute in float64 regardless of storage type (float32 arrays would
    # otherwise diverge from a double-precision oracle in the 6th decimal)
    a64 = F.transform(a, lambda x: x.cast("double"))
    b64 = F.transform(b, lambda x: x.cast("double"))
    return _dot(a64, b64) / (_norm(a64) * _norm(b64))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query id: top-k nearest corpus vectors by cosine (excluding
    self). Deterministic tie-break on neighbor id."""
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim)).tolist()


def signature_col(vec_col, planes: list[list[float]]):
    """B-bit sign signature as a long: bit i = sign(vec · plane_i)."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(float(x)) for x in p])) >= 0, F.lit(1)).otherwise(F.lit(0))
        * F.lit(2 ** i)
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    bits: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket, exact cosine re-rank within. IVF-style scale path: the bucket
    join shuffles only (signature, id, vec), and each bucket is a tiny
    partition-local problem."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits)
    sig = embeddings.withColumn("sig", signature_col(F.col(vec_col), planes))
    q = sig.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col("sig")
    )
    c = sig.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), F.col("sig"))
    scored = (
        F.broadcast(q)
        .join(c, "sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup tier). Exact
    O(n²) within — at scale use ``embedding_near_duplicates_lsh``."""
    a = embeddings.select(F.col(id_col).alias("ida"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("idb"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("ida") < F.col("idb"))
        .withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("ida", "idb", "cosine")
    )


def embedding_near_duplicates_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 12,
    bands: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Scale path for tier-5 dedup: random-hyperplane signature split into
    ``bands`` bands of bits/bands bits; candidate pairs share ≥1 band
    (near-identical vectors share most sign bits); exact cosine verify.
    The candidate join shuffles only (band_key, id, vec) and each band
    bucket is tiny — the O(n²) never materializes. Precision = 1 (exact
    verify); recall < 1 by design, rising with `bands`."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits)
    rows_per_band = bits // bands
    sig = embeddings.withColumn("sig", signature_col(F.col(vec_col), planes))
    banded = sig.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        F.explode(F.array(*[
            F.concat(
                F.lit(f"{b}:"),
                F.shiftrightunsigned(F.col("sig"), b * rows_per_band)
                % (2 ** rows_per_band),
            )
            for b in range(bands)
        ])).alias("band_key"),
    )
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"),
              (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"),
                F.col("a.vec").alias("va"), F.col("b.vec").alias("vb"))
        .dropDuplicates(["ida", "idb"])
    )
    return (
        pairs.withColumn("cosine", F.round(cosine_col(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("ida", "idb", "cosine")
    )
