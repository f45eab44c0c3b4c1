"""Entity linking as pure DataFrame joins — the huge-gazetteer degradation
path of ``operators/linking.py`` (J2 expressed relationally).

When the gazetteer no longer fits an executor broadcast (10^8+ aliases),
the same 3-tier semantics become:

  tier 1  equi-join mentions ⋈ gazetteer on normalized alias
          (Catalyst picks broadcast vs sort-merge; AQE splits skew),
  tier 2  ambiguity tie-break: context-embedding cosine scored per
          candidate row (Arrow UDF) + row_number window,
  tier 3  unmatched mentions ⋈ gazetteer on exploded LSH band keys,
          exact shingle-Jaccard verify + thresholded top-1.

Decision order, scoring, and tie-breaks replicate
``corpus.oracle.link_surface`` exactly — asserted equal in tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..functions.openie import context_score
from .simjoin import band_keys_udf, jaccard_udf, normalize_udf

FUZZY_THRESHOLD = 0.55


@F.pandas_udf(DoubleType())
def context_score_udf(context: pd.Series, canonical_name: pd.Series) -> pd.Series:
    memo: dict[tuple, float] = {}
    out = []
    for c, n in zip(context, canonical_name):
        key = (c, n)
        if key not in memo:
            memo[key] = context_score(c or "", n or "")
        out.append(memo[key])
    return pd.Series(out)


def _prep_gazetteer(gazetteer: DataFrame) -> DataFrame:
    return (
        gazetteer.select("alias", "ent_id", "canonical_name", "entity_type")
        .dropDuplicates(["alias", "ent_id"])
        .withColumn("norm_alias", normalize_udf(F.col("alias")))
    )


def link_mentions_joins(mentions: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """mentions(key..., surface, context) → + ent_id (null = unresolved).

    `mentions` must carry unique key columns (url, pos, role)."""
    gaz = _prep_gazetteer(gazetteer)
    m = mentions.withColumn("norm", normalize_udf(F.col("surface")))
    key = ["url", "pos", "role"]

    # tier 1+2: exact normalized match, ambiguity broken by context cosine
    exact = m.join(gaz, m.norm == gaz.norm_alias, "left")
    matched = exact.filter(F.col("ent_id").isNotNull())
    w1 = Window.partitionBy(*key).orderBy(
        F.desc(context_score_udf(F.col("context"), F.col("canonical_name"))),
        F.asc("ent_id"),
    )
    exact_best = (
        matched.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") == 1)
        .select(*key, "ent_id")
    )

    unmatched = exact.filter(F.col("ent_id").isNull()).select(*key, "surface", "norm", "context")

    # tier 3: LSH band candidate join + exact Jaccard verify, top-1 ≥ threshold
    m_bands = unmatched.withColumn("band_key", F.explode(band_keys_udf(F.col("norm"))))
    g_bands = gaz.withColumn("band_key", F.explode(band_keys_udf(F.col("norm_alias"))))
    cands = (
        m_bands.join(g_bands, "band_key")
        .dropDuplicates(key + ["ent_id", "alias"])
        .withColumn("__score", jaccard_udf(F.col("norm"), F.col("norm_alias")))
    )
    w3 = Window.partitionBy(*key).orderBy(F.desc("__score"), F.asc("ent_id"), F.asc("alias"))
    fuzzy_best = (
        cands.withColumn("__rn", F.row_number().over(w3))
        .filter((F.col("__rn") == 1) & (F.col("__score") >= FUZZY_THRESHOLD))
        .select(*key, "ent_id")
    )

    links = exact_best.unionByName(fuzzy_best)
    return mentions.join(links, key, "left")


def linking_stage_joins(triples: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Drop-in replacement for ``linking.linking_stage`` built from joins.
    Input: candidate triples (url, pos, pred, subj_surface, obj_surface,
    context). Output schema identical to ``linking.LINKED_SCHEMA``."""
    melted = triples.selectExpr(
        "url", "pos",
        "stack(2, 'subj', subj_surface, 'obj', obj_surface) as (role, surface)",
        "context",
    )
    linked = link_mentions_joins(melted, gazetteer)
    subj = linked.filter(F.col("role") == "subj").select(
        "url", "pos", F.col("ent_id").alias("subj_id")
    )
    obj = linked.filter(F.col("role") == "obj").select(
        "url", "pos", F.col("ent_id").alias("obj_id")
    )
    out = (
        triples.join(subj, ["url", "pos"], "left")
        .join(obj, ["url", "pos"], "left")
        .select(
            "url", "pos", "pred", "subj_id", "obj_id",
            "subj_surface", "obj_surface",
            (F.col("subj_id").isNotNull() & F.col("obj_id").isNotNull()).alias("resolved"),
        )
    )
    return out
