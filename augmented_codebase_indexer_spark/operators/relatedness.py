"""Link-based semantic relatedness — the Witten-Milne measure (Milne &
Witten AAAI'08 WikiAI, "An effective, low-cost measure of semantic
relatedness obtained from Wikipedia links"), the Normalized Google
Distance (Cilibrasi & Vitányi TKDE'07) applied to in-link sets:

    dist(a, b) = (ln max(|A|,|B|) − ln |A∩B|) / (ln N − ln min(|A|,|B|))

with A, B the in-link sets and N the node universe |src ∪ dst| (which
bounds every in-degree, keeping the denominator non-negative by
construction).  This is
the relatedness half of the Milne-Witten wikification stack —
`operators/anchors.py::mention_commonness` holds the prior half; their
composition disambiguates by coherence ("jaguar" near "amazon" resolves
by which senses are RELATED, commonness alone can't).

Exactness: every ln comes from the libm-free fixed-point BIGINT log
(`functions/intlog.py`), evaluated once per DISTINCT count value — the
ln argument vocabulary is {in-degrees} ∪ {overlap counts} ∪ {N}, tiny
next to the pair table — and joined back, so the gate is pure BIGINT
join/compare/trunc-divide arithmetic in both engines.
``relatedness_micro = greatest(0, 1e6 − dist_micro)`` (the published
clamp); the degenerate ``ln N = ln min`` denominator (an entity
in-linked by the whole universe) surfaces as NULL, never a division
error.

Scale shape at 10^9 entities: candidate pairs come from ONE linker-
keyed self-join — only entities sharing an in-linker pair, never all
pairs — with hub linkers above ``max_out`` dropped from the WHOLE
computation first (the standard WLM "stopword linker" prune: a page
linking to thousands of entities carries no discriminative signal;
the drop is deterministic and mirrored, so degrees and overlaps stay
mutually consistent).  Degrees and N are map-side-combinable
aggregates; the four ln joins are broadcast (count-vocabulary-sized).

Reference anchor: the reference scores symbol relatedness by shared
graph edges when assembling context (`src/aci/services/
context_assembler.py`) — this is the normalized, corpus-size-aware
form of that overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.functions.intlog import (
    duckdb_ln_micro_sql,
    with_ln_micro,
)

MICRO = 1_000_000


def wlm_relatedness(
    edges: DataFrame,
    min_common: int = 1,
    max_out: int = 1000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """→ (a, b, common, deg_a, deg_b, relatedness_micro): every
    unordered entity pair sharing ≥ ``min_common`` in-linkers (after
    the ``max_out`` hub prune), with the Witten-Milne relatedness in
    micro units.  ``a < b`` lexicographically; self-loops dropped."""
    if min_common < 1 or max_out < 2:
        raise ValueError("wlm_relatedness: min_common >= 1, max_out >= 2")
    from augmented_codebase_indexer_spark.operators.guards import (
        register_pin,
    )

    links = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    fanout = links.groupBy("src").agg(F.count("*").cast("long").alias("fo"))
    # pin the multi-consumer slim frames (links feeds degrees, N and the
    # pair join; deg and pairs feed the ln vocabulary AND the final
    # select) — unpinned, every downstream reference re-executed the
    # pair self-join (plan-audited at 147 exchanges; pinned it's one)
    links = register_pin(
        links.join(fanout, "src").filter(F.col("fo") <= max_out)
        .select("src", "dst")
        .persist()
    )
    deg = register_pin(
        links.groupBy("dst").agg(F.count("*").cast("long").alias("d"))
        .persist()
    )
    # N = |src ∪ dst| — the full node universe, so every in-degree (a
    # distinct-src count) is ≤ N and the WLM denominator is ≥ 0 by
    # construction (degenerate only when some min-degree equals N).
    n_row = (
        links.select(F.col("src").alias("v"))
        .union(links.select(F.col("dst").alias("v")))
        .distinct()
        .agg(F.count("*").cast("long").alias("n_univ"))
    )
    pairs = register_pin(
        links.alias("x")
        .join(links.alias("y"), "src")
        .filter(F.col("x.dst") < F.col("y.dst"))
        .groupBy(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
        .agg(F.count("*").cast("long").alias("common"))
        .filter(F.col("common") >= min_common)
        .persist()
    )
    vals = (
        deg.select(F.col("d").alias("val"))
        .union(pairs.select(F.col("common").alias("val")))
        .union(n_row.select(F.col("n_univ").alias("val")))
        .distinct()
    )
    lnt = register_pin(with_ln_micro(vals, "val", "1", "lnv").persist())
    scored = (
        pairs.join(deg.select(F.col("dst").alias("a"),
                              F.col("d").alias("deg_a")), "a")
        .join(deg.select(F.col("dst").alias("b"),
                         F.col("d").alias("deg_b")), "b")
        .crossJoin(F.broadcast(n_row))
        .join(F.broadcast(lnt.selectExpr("val AS _vmx", "lnv AS ln_max")),
              F.expr("greatest(deg_a, deg_b) = _vmx"))
        .join(F.broadcast(lnt.selectExpr("val AS _vmn", "lnv AS ln_min")),
              F.expr("least(deg_a, deg_b) = _vmn"))
        .join(F.broadcast(lnt.selectExpr("val AS _vc", "lnv AS ln_com")),
              F.expr("common = _vc"))
        .join(F.broadcast(lnt.selectExpr("val AS _vn", "lnv AS ln_n")),
              F.expr("n_univ = _vn"))
    )
    return scored.selectExpr(
        "a", "b", "common", "deg_a", "deg_b",
        f"CASE WHEN ln_n = ln_min THEN NULL "
        f"ELSE greatest(0, {MICRO} - (ln_max - ln_com) * {MICRO} "
        f"DIV (ln_n - ln_min)) END AS relatedness_micro",
    )


def wlm_relatedness_oracle_sql(
    edges_sql: str, min_common: int = 1, max_out: int = 1000
) -> str:
    """DuckDB mirror: same prune, same pair join, same count-vocabulary
    intlog lookup, same clamp and NULL guard."""
    lnt = duckdb_ln_micro_sql(
        "SELECT val FROM vals", "val", "1", "lnv", "val"
    )
    return f"""
    WITH raw AS ({edges_sql}),
    l0 AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
    fo AS (SELECT src, CAST(count(*) AS BIGINT) AS fo
           FROM l0 GROUP BY src),
    links AS MATERIALIZED (
      SELECT l0.src, l0.dst FROM l0 JOIN fo ON fo.src = l0.src
      WHERE fo.fo <= {max_out}),
    deg AS MATERIALIZED (
      SELECT dst, CAST(count(*) AS BIGINT) AS d FROM links GROUP BY dst),
    n AS (SELECT CAST(count(DISTINCT v) AS BIGINT) AS n_univ FROM (
      SELECT src AS v FROM links UNION ALL SELECT dst FROM links)),
    pairs AS MATERIALIZED (
      SELECT x.dst AS a, y.dst AS b, CAST(count(*) AS BIGINT) AS common
      FROM links x JOIN links y ON y.src = x.src AND x.dst < y.dst
      GROUP BY x.dst, y.dst
      HAVING count(*) >= {min_common}),
    vals AS MATERIALIZED (
      SELECT DISTINCT val FROM (
        SELECT d AS val FROM deg
        UNION ALL SELECT common FROM pairs
        UNION ALL SELECT n_univ FROM n)),
    lnt AS MATERIALIZED ({lnt})
    SELECT p.a, p.b, p.common, da.d AS deg_a, db.d AS deg_b,
           CASE WHEN lnn.lnv = lmn.lnv THEN NULL
                ELSE greatest(0, {MICRO} - (lmx.lnv - lc.lnv) * {MICRO}
                     // (lnn.lnv - lmn.lnv)) END AS relatedness_micro
    FROM pairs p
    JOIN deg da ON da.dst = p.a
    JOIN deg db ON db.dst = p.b
    CROSS JOIN n
    JOIN lnt lmx ON lmx.val = greatest(da.d, db.d)
    JOIN lnt lmn ON lmn.val = least(da.d, db.d)
    JOIN lnt lc ON lc.val = p.common
    JOIN lnt lnn ON lnn.val = n.n_univ
    """
