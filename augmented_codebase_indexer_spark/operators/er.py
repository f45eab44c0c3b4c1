"""Blocked pairwise entity resolution — the classic ER pipeline shape
(Fellegi & Sunter JASA'69; blocking surveyed in Christen TKDE'12):
cheap BLOCKING key → candidate pairs within a block → exact similarity
features → threshold match. This complements the suite's alias-table
linking (``operators/linking.py`` resolves mentions against a KNOWN
gazetteer; ER here deduplicates the entity table ITSELF — the step a
multi-source KG runs after ``kg_multisource`` unions five families of
extractions whose surface forms drift: 'Entity7' vs 'Entity 7' vs
'entity-7').

Scale shape: the block key is a narrow expression; pairs are generated
by a block-keyed SELF-JOIN (shuffle on the block key only — names never
pair across blocks, the whole point of blocking), with a counted
``max_block_size`` guard that DROPS oversized blocks observably (the
dedup bucket-cap discipline: a 10^6-name block is a skew bug, not a
workload). Features are JVM built-ins: ``levenshtein`` (exact integer —
identical by definition in Spark and DuckDB) and containment. No UDF,
no cross join, no unbounded window.

Match rule (deterministic, integer-only): levenshtein(a, b) ≤ max_dist
OR one normalized name contains the other. Output keeps the raw
distance so downstream can re-threshold without re-pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# strip to lowercase alphanumerics: 'Entity 7' / 'entity-7' → 'entity7'
_NORM_RE = "[^a-z0-9]+"


def _norm(col):
    return F.regexp_replace(F.lower(col), _NORM_RE, "")


def _norm_sql(expr: str) -> str:
    return f"regexp_replace(lower({expr}), '{_NORM_RE}', '', 'g')"


def er_candidate_pairs(
    entities: DataFrame,
    id_col: str = "ent_id",
    name_col: str = "name",
    block_prefix: int = 4,
    max_block_size: int = 1000,
) -> DataFrame:
    """→ (id_a, id_b, name_a, name_b, lev, contained) for every ordered
    pair (id_a < id_b) sharing a block (first ``block_prefix`` chars of
    the normalized name). Distinct (id, name) rows pair once; blocks
    larger than ``max_block_size`` are dropped whole (observable via
    :func:`oversized_blocks`)."""
    base = (
        entities.select(
            F.col(id_col).alias("ent_id"),
            F.col(name_col).alias("name"),
            _norm(F.col(name_col)).alias("norm"),
        )
        .filter(F.col("norm") != "")
        .withColumn("block", F.substring("norm", 1, block_prefix))
        .distinct()
    )
    sizes = base.groupBy("block").agg(F.count("*").alias("_bn"))
    kept = base.join(
        F.broadcast(sizes.filter(F.col("_bn") <= max_block_size).select("block")),
        "block",
    )
    a = kept.select(
        "block", F.col("ent_id").alias("id_a"),
        F.col("name").alias("name_a"), F.col("norm").alias("norm_a"),
    )
    b = kept.select(
        "block", F.col("ent_id").alias("id_b"),
        F.col("name").alias("name_b"), F.col("norm").alias("norm_b"),
    )
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", "name_a", "name_b",
            F.levenshtein("norm_a", "norm_b").cast("long").alias("lev"),
            (
                F.col("norm_a").contains(F.col("norm_b"))
                | F.col("norm_b").contains(F.col("norm_a"))
            ).alias("contained"),
        )
    )


def er_matches(
    entities: DataFrame,
    max_dist: int = 1,
    id_col: str = "ent_id",
    name_col: str = "name",
    block_prefix: int = 4,
    max_block_size: int = 1000,
) -> DataFrame:
    """Candidate pairs passing the match rule: lev ≤ max_dist OR
    containment. (id_a < id_b, lev, contained) — exact integers/bools.

    r7: the match rule depends only on the NAMES, so it is decided at the
    distinct-(block, name) grain and expanded to id pairs afterwards —
    levenshtein runs once per name pair instead of once per id pair (the
    id-grain self-join evaluated it ~50M times at bench scale for 17k
    surviving rows). Duplicate-heavy entity tables are exactly the regime
    this operator exists for; with all-unique names the name grain equals
    the id grain and nothing is lost. Same pair set, same values
    (pytest: test_er.py; oracle unchanged)."""
    base = (
        entities.select(
            F.col(id_col).alias("ent_id"),
            F.col(name_col).alias("name"),
            _norm(F.col(name_col)).alias("norm"),
        )
        .filter(F.col("norm") != "")
        .withColumn("block", F.substring("norm", 1, block_prefix))
        .distinct()
    )
    sizes = base.groupBy("block").agg(F.count("*").alias("_bn"))
    kept = base.join(
        F.broadcast(sizes.filter(F.col("_bn") <= max_block_size).select("block")),
        "block",
    )
    from .guards import register_pin

    kept = register_pin(kept.persist())
    names = kept.select("block", "name", "norm").distinct()
    npairs = (
        names.selectExpr("block", "name AS n_a", "norm AS norm_a")
        .join(
            names.selectExpr("block", "name AS n_b", "norm AS norm_b"), "block"
        )
        .filter(F.col("n_a") <= F.col("n_b"))  # unordered name pairs, once
        .select(
            "block", "n_a", "n_b",
            F.levenshtein("norm_a", "norm_b").cast("long").alias("lev"),
            (
                F.col("norm_a").contains(F.col("norm_b"))
                | F.col("norm_b").contains(F.col("norm_a"))
            ).alias("contained"),
        )
        .filter((F.col("lev") <= max_dist) | F.col("contained"))
    )
    ex = (
        npairs
        .join(
            kept.select(
                "block", F.col("name").alias("n_a"), F.col("ent_id").alias("ia")
            ),
            ["block", "n_a"],
        )
        .join(
            kept.select(
                "block", F.col("name").alias("n_b"), F.col("ent_id").alias("ib")
            ),
            ["block", "n_b"],
        )
        .filter(F.col("ia") != F.col("ib"))
        # a same-name pair materializes both orientations — keep one
        .filter((F.col("n_a") != F.col("n_b")) | (F.col("ia") < F.col("ib")))
    )
    swap = F.col("ia") < F.col("ib")
    return ex.select(
        F.least("ia", "ib").alias("id_a"),
        F.greatest("ia", "ib").alias("id_b"),
        F.when(swap, F.col("n_a")).otherwise(F.col("n_b")).alias("name_a"),
        F.when(swap, F.col("n_b")).otherwise(F.col("n_a")).alias("name_b"),
        "lev",
        "contained",
    )


def oversized_blocks(
    entities: DataFrame,
    id_col: str = "ent_id",
    name_col: str = "name",
    block_prefix: int = 4,
    max_block_size: int = 1000,
) -> DataFrame:
    """The observable-drops side channel: (block, n) for every block the
    pair generator skipped."""
    base = (
        entities.select(
            _norm(F.col(name_col)).alias("norm"), F.col(id_col).alias("ent_id"),
            F.col(name_col).alias("name"),
        )
        .filter(F.col("norm") != "")
        .withColumn("block", F.substring("norm", 1, block_prefix))
        .distinct()
    )
    return (
        base.groupBy("block").agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") > max_block_size)
    )


def er_matches_oracle_sql(
    entities_sql: str,
    max_dist: int = 1,
    block_prefix: int = 4,
    max_block_size: int = 1000,
) -> str:
    """DuckDB mirror (entities_sql must expose ent_id, name) — identical
    normalization, blocking, levenshtein (both engines: the standard
    integer edit distance), containment and thresholds."""
    return f"""
    WITH e AS ({entities_sql}),
    base AS (
      SELECT DISTINCT ent_id, name, {_norm_sql("name")} AS norm
      FROM e WHERE {_norm_sql("name")} <> ''),
    blocked AS (
      SELECT *, substring(norm, 1, {block_prefix}) AS block FROM base),
    sizes AS (SELECT block, count(*) AS bn FROM blocked GROUP BY block),
    kept AS (
      SELECT b.* FROM blocked b JOIN sizes s USING (block)
      WHERE s.bn <= {max_block_size}),
    pairs AS (
      SELECT a.ent_id AS id_a, b.ent_id AS id_b,
             a.name AS name_a, b.name AS name_b,
             CAST(levenshtein(a.norm, b.norm) AS BIGINT) AS lev,
             (contains(a.norm, b.norm) OR contains(b.norm, a.norm))
               AS contained
      FROM kept a JOIN kept b ON a.block = b.block AND a.ent_id < b.ent_id)
    SELECT * FROM pairs WHERE lev <= {max_dist} OR contained
    """
