"""Entity co-mention PMI — relation discovery from mention co-occurrence.

Entities that appear in the same documents far more often than chance
are related; pointwise mutual information over the co-mention counts is
the classic unsupervised relation-discovery signal (Church & Hanks,
CL'90 "Word association norms, mutual information, and lexicography")
and feeds candidate generation for the typed extractors (Hearst /
OpenIE) the repo already has. The reference's analog is co-occurrence
inside a file's chunk neighbourhood (symbols indexed together in
`core/graph_builder.py`); the web-KG batch form is per-document.

Exactness: PMI(x,y) = log(n_xy·N / (n_x·n_y)) is monotone in the
BIGINT ratio n_xy·N·10⁶ // (n_x·n_y), so the gated output emits that
integer (``pmi_ratio_micro``) plus the raw counts — never a float log
(the [[oracle-exactness-discipline]] that made lm_quality green).
A per-row JVM ``raise_error`` guards the n_ab·N·10⁶ product against
silent BIGINT wrap (DuckDB errors loudly on overflow; Spark would
wrap — the guard makes both engines fail the same way).

Scale shape: one distinct over (doc, ent); the pair self-join keys on
doc_id with per-doc entity counts capped (Θ(cap²) worst case per doc,
raised on loudly — repo no-silent policy, same as mentions_joins'
over-cap alias raise); pair and marginal counts are algebraic
aggregates (map-side combine absorbs hot pairs before the exchange);
marginals join back via the counted broadcast guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .guards import guarded_broadcast

_I64_MAX = (1 << 63) - 1


def comention_pmi(
    mentions: DataFrame,
    doc_col: str = "doc_id",
    ent_col: str = "ent_id",
    max_entities_per_doc: int | None = 256,
) -> DataFrame:
    """mentions(doc, ent) → (ent_a, ent_b, n_ab, n_a, n_b,
    pmi_ratio_micro) per unordered co-mentioned pair (ent_a < ent_b).

    ``pmi_ratio_micro = n_ab·N·10⁶ // (n_a·n_b)`` — BIGINT, exact, and
    monotone in PMI, so ranking/thresholding on it equals ranking on
    the float PMI without the cross-engine rounding hazard.

    ``max_entities_per_doc`` bounds the per-doc pair blow-up; documents
    over the cap raise with the count named (pass ``None`` to skip the
    check when the input is structurally bounded, e.g. closed-form
    derived mentions)."""
    m = mentions.select(
        F.col(doc_col).alias("doc_id"), F.col(ent_col).alias("ent")
    ).distinct()

    if max_entities_per_doc is not None:
        n_over = (
            m.groupBy("doc_id")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_entities_per_doc)
            .count()
        )
        if n_over:
            raise ValueError(
                f"comention_pmi: {n_over} documents mention more than "
                f"{max_entities_per_doc} distinct entities — the per-doc "
                "pair join would go quadratic. Raise max_entities_per_doc "
                "deliberately or pre-filter hub documents."
            )

    n_docs = m.select("doc_id").distinct().count()

    marg = m.groupBy("ent").agg(F.count("*").alias("n"))  # m is (doc,ent)-distinct
    pairs = (
        m.alias("a")
        .join(
            m.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.ent") < F.col("b.ent")),
        )
        .groupBy(F.col("a.ent").alias("ent_a"), F.col("b.ent").alias("ent_b"))
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    marg_b = guarded_broadcast(marg)
    out = (
        pairs.join(marg_b.select(F.col("ent").alias("ent_a"), F.col("n").alias("n_a")), "ent_a")
        .join(marg_b.select(F.col("ent").alias("ent_b"), F.col("n").alias("n_b")), "ent_b")
    )
    # overflow guard: n_ab·N·10⁶ must fit in int64 on BOTH engines
    cap = _I64_MAX // 1_000_000 // max(1, n_docs)
    ratio = F.expr(f"CAST(n_ab * {n_docs}L * 1000000L DIV (n_a * n_b) AS BIGINT)")
    return out.select(
        "ent_a",
        "ent_b",
        "n_ab",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.when(
            F.col("n_ab") > F.lit(cap),
            F.raise_error(
                F.lit(
                    "comention_pmi: n_ab*N*1e6 would overflow BIGINT — "
                    "compute PMI on a sampled or windowed count table"
                )
            ).cast("long"),
        )
        .otherwise(ratio)
        .alias("pmi_ratio_micro"),
    )


def comention_pmi_sql(mentions_sql: str) -> str:
    """DuckDB mirror over a closed-form (doc_id, ent) relation (UNION-
    deduped upstream or not — distinctness is re-imposed here)."""
    return f"""
    WITH m AS (SELECT DISTINCT doc_id, ent FROM ({mentions_sql})),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM m),
    marg AS (SELECT ent, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY ent),
    pairs AS (
      SELECT a.ent AS ent_a, b.ent AS ent_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.ent < b.ent
      GROUP BY a.ent, b.ent)
    SELECT p.ent_a, p.ent_b, p.n_ab, ma.n AS n_a, mb.n AS n_b,
           CAST((p.n_ab * nd.n_docs * 1000000) // (ma.n * mb.n) AS BIGINT)
             AS pmi_ratio_micro
    FROM pairs p
    CROSS JOIN nd
    JOIN marg ma ON ma.ent = p.ent_a
    JOIN marg mb ON mb.ent = p.ent_b
    """
