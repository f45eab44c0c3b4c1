"""Predicate alignment by extension overlap — the schema-matching step
of multi-source KG merging (the instance-based core of PARIS, VLDB'12
§4: two relations align when their edge sets overlap; Madhavan et al.'s
"corpus-based schema matching" is the same signal): after merging
crawl-family triple sources, 'works_at' from one extractor and
'employer' from another are the SAME predicate, and the merged graph
should say so before canonicalization fans out aliases.

Verdict is exact-integer Jaccard over the DISTINCT (subj, obj) pair
sets:

    aligned  ⇔  n_common · den  >  (n_a + n_b − n_common) · num

with ``jaccard_micro`` displayed via one truncating division. Only
pairs with ≥ 1 common edge surface (sparse convention — disjoint
predicates are absent, not zero rows).

Scale shape: one (subj, obj)-keyed self-equi-join of the distinct
triple set (co-located under subject-hash bucketing since subj leads
the key), pred_a < pred_b so each pair counts once; the pair counts and
per-predicate sizes both combine map-side; sizes join back as a
predicate-vocabulary-sized broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_alignment(
    triples: DataFrame, threshold: tuple[int, int] = (1, 2)
) -> DataFrame:
    """→ (pred_a, pred_b, n_common, n_a, n_b, jaccard_micro, aligned):
    every unordered predicate pair sharing ≥ 1 (subj, obj) edge, with
    the cross-multiplied Jaccard ≥-test at ``threshold`` = (num, den)."""
    num, den = threshold
    if num <= 0 or den <= 0:
        raise ValueError("predicate_alignment: threshold must be positive")
    t = triples.select("subj", "pred", "obj").distinct()
    sizes = t.groupBy("pred").agg(F.count("*").cast("long").alias("n"))
    a = t.select("subj", "obj", F.col("pred").alias("pred_a"))
    b = t.select("subj", "obj", F.col("pred").alias("pred_b"))
    common = (
        a.join(b, ["subj", "obj"])
        .filter(F.col("pred_a") < F.col("pred_b"))
        .groupBy("pred_a", "pred_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.withColumnRenamed("pred", "pred_a")
                        .withColumnRenamed("n", "n_a")), "pred_a")
        .join(
            F.broadcast(sizes.withColumnRenamed("pred", "pred_b")
                        .withColumnRenamed("n", "n_b")), "pred_b")
        .selectExpr(
            "pred_a", "pred_b", "n_common", "n_a", "n_b",
            "(n_common * 1000000) DIV (n_a + n_b - n_common)"
            " AS jaccard_micro",
            f"n_common * {den} > (n_a + n_b - n_common) * {num} AS aligned",
        )
    )


def predicate_alignment_oracle_sql(
    triples_sql: str, threshold: tuple[int, int] = (1, 2)
) -> str:
    """DuckDB mirror: same distinct basis, same cross-multiplied gate."""
    num, den = threshold
    return f"""
    WITH t AS MATERIALIZED (
      SELECT DISTINCT subj, pred, obj FROM ({triples_sql})),
    sizes AS (SELECT pred, CAST(count(*) AS BIGINT) AS n
              FROM t GROUP BY pred),
    common AS (
      SELECT a.pred AS pred_a, b.pred AS pred_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM t a JOIN t b ON a.subj = b.subj AND a.obj = b.obj
      WHERE a.pred < b.pred GROUP BY a.pred, b.pred)
    SELECT c.pred_a, c.pred_b, c.n_common, sa.n AS n_a, sb.n AS n_b,
           (c.n_common * 1000000) // (sa.n + sb.n - c.n_common)
             AS jaccard_micro,
           c.n_common * {den} > (sa.n + sb.n - c.n_common) * {num}
             AS aligned
    FROM common c
    JOIN sizes sa ON c.pred_a = sa.pred
    JOIN sizes sb ON c.pred_b = sb.pred
    """
