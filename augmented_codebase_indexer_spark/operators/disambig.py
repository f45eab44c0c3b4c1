"""Coherence-based entity disambiguation — the full Milne-Witten
wikification decision (Milne & Witten CIKM'08 "Learning to link with
Wikipedia"): for each ambiguous mention, blend the COMMONNESS prior
(`operators/anchors.py::mention_commonness` — how often the phrase
means each candidate across the link graph) with COHERENCE (mean
`operators/relatedness.py::wlm_relatedness` between the candidate and
the document's unambiguous context entities).  "jaguar" next to
unambiguous "rainforest" resolves to the animal; next to "v12 engine"
to the car — the prior alone cannot do that.

Semantics (documented reduction of the paper's trained blend):
context = targets of the document's UNAMBIGUOUS surfaces (exactly one
candidate — the paper's context seeds); only surfaces with ≥2
candidates are scored for coherence; a candidate that IS one of the
context entities scores 1e6 against itself (strongest evidence);
absent relatedness pairs score 0; a doc with no context falls back to
the prior alone.  ``score_micro = (commonness_micro + coherence_micro)
DIV 2`` — the paper's equal-weight starting point, all-BIGINT.  Winner
per (doc, surface) is a min(struct) argmax with the candidate id as
tie-break.  Unambiguous mentions pass through with NULL coherence and
the prior as their score.

Scale shape at 10^10 mentions: priors and candidate counts are anchor-
vocabulary-sized; the relatedness table is pair-vocabulary-sized and
built once (pinned inside wlm_relatedness); the only mention-scale
joins are surface-keyed (mentions × candidates-per-surface) and
doc-keyed (candidates × context-per-doc) — both fan-outs bounded by
vocabulary statistics, not corpus size.  No window over raw mentions;
the argmax is min(struct) on the already-aggregated score frame.

Reference anchor: the reference's 3-tier entity linker resolves a
mention by gazetteer priority without document context
(`src/aci/core/graph_builder` linking tiers) — this adds the
context-coherence tier web-scale ambiguity requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.anchors import (
    mention_commonness,
)
from augmented_codebase_indexer_spark.operators.guards import register_pin
from augmented_codebase_indexer_spark.operators.relatedness import (
    wlm_relatedness,
)

MICRO = 1_000_000


def disambiguate(
    mentions: DataFrame,
    anchors: DataFrame,
    min_common: int = 1,
    max_out: int = 1000,
) -> DataFrame:
    """→ (doc_id, surface, target, n_cands, commonness_micro,
    coherence_micro, score_micro): one resolved target per distinct
    (doc, normalized surface).

    ``mentions`` is (doc_id, surface); ``anchors`` is (src_url, anchor,
    href) — the link graph supplying BOTH the priors and the
    relatedness edges.  Surfaces without any anchor evidence are absent
    (no candidate set → nothing to link)."""
    cands = register_pin(
        mention_commonness(anchors)
        .selectExpr("mention AS surface", "href AS target",
                    "commonness_micro")
        .persist()
    )
    n_cands = cands.groupBy("surface").agg(
        F.count("*").cast("long").alias("n_cands")
    )
    cands = cands.join(n_cands, "surface")
    m = mentions.selectExpr(
        "doc_id",
        "regexp_replace(trim(lower(surface)), '\\\\s+', ' ') AS surface",
    ).filter(F.col("surface") != "").distinct()
    mc = m.join(cands, "surface")
    ctx = register_pin(
        mc.filter(F.col("n_cands") == 1)
        .select("doc_id", F.col("target").alias("ctx"))
        .distinct()
        .persist()
    )
    rel = wlm_relatedness(
        anchors.selectExpr("src_url AS src", "href AS dst"),
        min_common=min_common, max_out=max_out,
    ).selectExpr("a", "b", "coalesce(relatedness_micro, 0) AS r")
    rel_sym = register_pin(
        rel.unionByName(rel.selectExpr("b AS a", "a AS b", "r")).persist()
    )
    amb = mc.filter(F.col("n_cands") >= 2)
    cohered = (
        amb.join(ctx, "doc_id", "left")
        .join(
            rel_sym,
            (F.col("target") == F.col("a")) & (F.col("ctx") == F.col("b")),
            "left",
        )
        .selectExpr(
            "doc_id", "surface", "target", "n_cands", "commonness_micro",
            "ctx",
            f"CASE WHEN ctx IS NULL THEN NULL "
            f"WHEN ctx = target THEN {MICRO} "
            f"ELSE coalesce(r, 0) END AS rel",
        )
        .groupBy("doc_id", "surface", "target", "n_cands",
                 "commonness_micro")
        .agg(
            F.count("ctx").cast("long").alias("n_ctx"),
            F.coalesce(F.sum("rel"), F.lit(0)).alias("rel_sum"),
        )
        .selectExpr(
            "doc_id", "surface", "target", "n_cands", "commonness_micro",
            "CASE WHEN n_ctx = 0 THEN 0 ELSE rel_sum DIV n_ctx END"
            " AS coherence_micro",
        )
        .selectExpr(
            "*",
            "(commonness_micro + coherence_micro) DIV 2 AS score_micro",
        )
    )
    winners = (
        cohered.groupBy("doc_id", "surface")
        .agg(F.min(F.struct(
            (-F.col("score_micro")).alias("ns"),
            F.col("target").alias("t"),
            F.col("n_cands").alias("nc"),
            F.col("commonness_micro").alias("cm"),
            F.col("coherence_micro").alias("ch"),
            F.col("score_micro").alias("sc"),
        )).alias("w"))
        .selectExpr(
            "doc_id", "surface", "w.t AS target", "w.nc AS n_cands",
            "w.cm AS commonness_micro", "w.ch AS coherence_micro",
            "w.sc AS score_micro",
        )
    )
    unamb = mc.filter(F.col("n_cands") == 1).selectExpr(
        "doc_id", "surface", "target", "n_cands", "commonness_micro",
        "CAST(NULL AS BIGINT) AS coherence_micro",
        "commonness_micro AS score_micro",
    )
    return winners.unionByName(unamb)


def disambiguate_oracle_sql(
    mentions_sql: str,
    anchors_sql: str,
    min_common: int = 1,
    max_out: int = 1000,
) -> str:
    """DuckDB mirror: the commonness and relatedness mirrors embedded
    as materialized CTE subqueries, then the same context/coherence/
    argmax composition."""
    from augmented_codebase_indexer_spark.operators.relatedness import (
        wlm_relatedness_oracle_sql,
    )

    rel_q = wlm_relatedness_oracle_sql(
        f"SELECT src_url AS src, href AS dst FROM ({anchors_sql})",
        min_common=min_common, max_out=max_out,
    )
    return f"""
    WITH pr AS MATERIALIZED (
      SELECT mention AS surface, href AS target,
             n * {MICRO} // n_total AS commonness_micro
      FROM (
        SELECT mention, href, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(count(*)) OVER (PARTITION BY mention) AS BIGINT)
                 AS n_total
        FROM (SELECT regexp_replace(trim(lower(anchor)), '\\s+', ' ')
                       AS mention, href
              FROM ({anchors_sql})
              WHERE regexp_replace(trim(lower(anchor)), '\\s+', ' ') <> '')
        GROUP BY mention, href)),
    cands AS MATERIALIZED (
      SELECT pr.*, nc.n_cands FROM pr
      JOIN (SELECT surface, CAST(count(*) AS BIGINT) AS n_cands
            FROM pr GROUP BY surface) nc USING (surface)),
    m AS (
      SELECT DISTINCT doc_id,
             regexp_replace(trim(lower(surface)), '\\s+', ' ') AS surface
      FROM ({mentions_sql})
      WHERE regexp_replace(trim(lower(surface)), '\\s+', ' ') <> ''),
    mc AS MATERIALIZED (
      SELECT m.doc_id, m.surface, c.target, c.n_cands, c.commonness_micro
      FROM m JOIN cands c USING (surface)),
    ctx AS MATERIALIZED (
      SELECT DISTINCT doc_id, target AS ctx FROM mc WHERE n_cands = 1),
    rel0 AS MATERIALIZED (
      SELECT a, b, coalesce(relatedness_micro, 0) AS r
      FROM ({rel_q}) relq),
    rel_sym AS MATERIALIZED (
      SELECT a, b, r FROM rel0
      UNION ALL SELECT b, a, r FROM rel0),
    cohered AS (
      SELECT doc_id, surface, target, n_cands, commonness_micro,
             CASE WHEN count(ctx) = 0 THEN 0
                  ELSE coalesce(sum(rel), 0) // count(ctx) END
               AS coherence_micro
      FROM (
        SELECT mc.doc_id, mc.surface, mc.target, mc.n_cands,
               mc.commonness_micro, cx.ctx,
               CASE WHEN cx.ctx IS NULL THEN NULL
                    WHEN cx.ctx = mc.target THEN {MICRO}
                    ELSE coalesce(rs.r, 0) END AS rel
        FROM mc
        LEFT JOIN ctx cx ON cx.doc_id = mc.doc_id
        LEFT JOIN rel_sym rs ON rs.a = mc.target AND rs.b = cx.ctx
        WHERE mc.n_cands >= 2)
      GROUP BY doc_id, surface, target, n_cands, commonness_micro),
    scored AS (
      SELECT *, (commonness_micro + coherence_micro) // 2 AS score_micro
      FROM cohered),
    winners AS (
      SELECT doc_id, surface, w[2] AS target, w[3] AS n_cands,
             w[4] AS commonness_micro, w[5] AS coherence_micro,
             w[6] AS score_micro
      FROM (SELECT doc_id, surface,
                   min(ROW(-score_micro, target, n_cands,
                           commonness_micro, coherence_micro,
                           score_micro)) AS w
            FROM scored GROUP BY doc_id, surface))
    SELECT doc_id, surface, target, n_cands, commonness_micro,
           coherence_micro, score_micro FROM winners
    UNION ALL
    SELECT doc_id, surface, target, n_cands, commonness_micro,
           CAST(NULL AS BIGINT), commonness_micro
    FROM mc WHERE n_cands = 1
    """
