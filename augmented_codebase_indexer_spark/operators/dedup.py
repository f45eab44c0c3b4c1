"""Deduplication operators for training-data pipelines over `documents`.

Five tiers, cheapest first (run them in this order at 100 TB — each tier
shrinks the candidate set of the next):

  1. exact        — content-hash groupBy (C1 analog, ``scanner.py:22-24``)
  2. ngram-jaccard— EXACT token-set Jaccard as pure relational algebra
                    (explode → equi-join → |∩| / (|A|+|B|−|∩|)); no UDF at
                    all, fully Catalyst-optimizable and SQL-mirrorable
  3. minhash-LSH  — banded signature join (``operators/simjoin.py``)
  4. simhash      — 64-bit fingerprints, banded by 16-bit chunks, verified
                    by Hamming distance
  5. embedding    — cosine near-dup over `array<float>` (see operators/ann)

Scale notes: tier-1 group key is `sha2(text)` — uniform, no skew. Tier-2's
token explode is the big shuffle; it is bounded by distinct-token
cardinality per doc (array_distinct first) and benefits from a stopword/
min-df filter at real scale (`min_token_len`). Tier-3/4 candidate buckets
are capped via ``max_bucket_size`` to avoid quadratic blowup on boilerplate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..functions.hashing import simhash64
from .simjoin import lsh_self_join


def exact_duplicate_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (content_hash, dup_count, doc_ids)."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("dup_count"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Exact token n-gram set Jaccard ≥ threshold, as pure DataFrame algebra.

    tokens → distinct n-grams per doc → self equi-join on gram →
    per-pair intersection count → Jaccard. No Python anywhere.

    ``max_df`` drops grams occurring in more than max_df documents before
    the join (standard max-df pruning): ubiquitous grams carry no dedup
    signal but produce O(df²) join pairs — at web scale this cap is what
    keeps the self-join from going quadratic on boilerplate vocabulary.
    Jaccard is then over the FILTERED gram sets (both |∩| and sizes)."""
    toks = F.split(F.col(text_col), " ")
    if n == 1:
        grams = F.array_distinct(toks)
    else:
        # sliding n-grams via transform over index range
        grams = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    g = df.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
    if max_df is not None:
        dfreq = g.groupBy("gram").agg(F.count("*").alias("__df"))
        g = g.join(dfreq.filter(F.col("__df") <= max_df).select("gram"), "gram")
    sizes = g.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        g.alias("a")
        .join(g.alias("b"), (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "ida").withColumnRenamed("sz", "sza"), "ida")
        .join(sizes.withColumnRenamed("id", "idb").withColumnRenamed("sz", "szb"), "idb")
        .withColumn("jaccard", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("ida", "idb", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_near_duplicates(
    df: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """MinHash-LSH candidate join + exact char-shingle Jaccard verify."""
    return lsh_self_join(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")),
        jaccard_threshold=threshold,
        normalize=False,
        max_bucket_size=max_bucket_size,
    ).select(F.col("a").alias("ida"), F.col("b").alias("idb"), F.round("jaccard", 6).alias("jaccard"))


@F.pandas_udf(LongType())
def simhash_udf(s: pd.Series) -> pd.Series:
    return pd.Series([simhash64(x) if x is not None else 0 for x in s], dtype="int64")


def simhash_near_duplicates(
    df: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dups: band the 64-bit fingerprint into 4×16-bit chunks
    (pigeonhole: hamming ≤ 6 ⇒ at least one of 4 chunks is equal... for
    hamming ≤ 3; for ≤6 it's a recall heuristic), join on chunk equality,
    verify with exact popcount — all JVM-side bit ops."""
    sh = df.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("sim"))
    chunks = sh.select(
        "id", "sim",
        F.explode(
            F.array(*[
                F.concat(F.lit(f"{i}:"), F.shiftrightunsigned(F.col("sim"), 16 * i) % 65536)
                for i in range(4)
            ])
        ).alias("chunk"),
    )
    pairs = (
        chunks.alias("a")
        .join(chunks.alias("b"), (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("ida"), F.col("b.id").alias("idb"),
            F.col("a.sim").alias("sima"), F.col("b.sim").alias("simb"),
        )
        .dropDuplicates(["ida", "idb"])
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("sima").bitwiseXOR(F.col("simb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("ida", "idb", "hamming")
    )


def keep_canonical_per_group(dups: DataFrame, all_ids: DataFrame) -> DataFrame:
    """Dedup policy: within each duplicate group keep min(id) (deterministic
    winner — W1 analog); returns surviving ids."""
    losers = dups.select(F.greatest("ida", "idb").alias("id")).distinct()
    return all_ids.join(losers, "id", "left_anti")
