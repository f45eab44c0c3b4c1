"""Inter-extractor agreement — Cohen's kappa (Cohen 1960, "A
coefficient of agreement for nominal scales") between two labelers of
the same item universe, chance-corrected: ``κ = (p_o − p_e)/(1 − p_e)``
with ``p_o`` the observed agreement rate and ``p_e`` the agreement two
independent raters with the same marginals would reach by luck.  The
KG-QA reading: two extraction families (regex tier vs gazetteer tier,
JSON-LD vs web-table recovery) labeling the same (subj, pred) keys —
raw overlap flatters skewed label distributions, kappa doesn't.

Exactness: with ``N`` joint items, ``A`` agreements and
``S = Σ_l a_l·b_l`` the marginal product sum, κ's rational form is
``(A·N − S) / (N² − S)`` — BIGINT throughout, quantized by one
truncating division to ``kappa_micro``.  ``expected_micro`` uses the
staged form ``(S DIV N)·1e6 DIV N`` so no intermediate exceeds
``N·1e6``.  Both raters are deduplicated to one label per item
(min-label, deterministic) before comparison.  BIGINT bound: N² and
(A·N − S)·1e6 must fit — exact up to N ≈ 3·10⁶ joint items, the
evaluation-slice scale this statistic is for; beyond that, sample the
slice (kappa is a rate estimate, not an inventory).

Scale shape: the item-keyed equi-join of the two (item, label)
relations executes ONCE and folds straight into the label-vocab²
contingency-cell table (pinned); N, agreements, marginals and S all
derive from the cells, so nothing is corpus-sized after the first
map-side combine and the join never re-executes per aggregate.

Reference anchor: the reference's evaluation service compares expected
vs produced triples per run (`src/aci/services/evaluation_service.py`)
— kappa is the chance-corrected form of that comparison when both
sides are machine extractors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _one_label(df: DataFrame, item_col: str, label_col: str, out: str) -> DataFrame:
    return df.groupBy(F.col(item_col).alias("item")).agg(
        F.min(F.col(label_col)).alias(out)
    )


def cohens_kappa(
    a: DataFrame,
    b: DataFrame,
    item_col: str = "item",
    label_col: str = "label",
) -> DataFrame:
    """→ one row (n_items, n_agree, sum_marg, agree_micro,
    expected_micro, kappa_micro): Cohen's kappa between labelers ``a``
    and ``b`` over their JOINT item set (inner join — items one side
    never saw carry no agreement evidence).  ``kappa_micro`` is NULL
    when p_e = 1 (both raters constant and identical — κ undefined);
    an empty joint set yields zero rows."""
    from augmented_codebase_indexer_spark.operators.guards import (
        register_pin,
    )

    la = _one_label(a, item_col, label_col, "la")
    lb = _one_label(b, item_col, label_col, "lb")
    # fold the item-keyed join ONCE into the contingency-cell table —
    # everything downstream (N, agreements, marginals, S) derives from
    # the label-vocab²-sized cells, so the expensive join never
    # re-executes per aggregate (plan-audited: the naive three-consumer
    # form re-ran it three times)
    cells = register_pin(
        la.join(lb, "item")
        .groupBy("la", "lb")
        .agg(F.count("*").cast("long").alias("c"))
        .persist()
    )
    counts = cells.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_items"),
        F.coalesce(
            F.sum(F.when(F.col("la") == F.col("lb"), F.col("c"))), F.lit(0)
        ).alias("n_agree"),
    )
    marg = (
        cells.groupBy("la").agg(F.sum("c").alias("ca"))
        .join(
            cells.groupBy("lb").agg(F.sum("c").alias("cb")),
            F.col("la") == F.col("lb"),
        )
        .agg(F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0)).alias("sum_marg"))
    )
    return counts.join(marg).filter(F.col("n_items") > 0).selectExpr(
        "n_items", "n_agree", "sum_marg",
        f"n_agree * {MICRO} DIV n_items AS agree_micro",
        f"(sum_marg DIV n_items) * {MICRO} DIV n_items AS expected_micro",
        "CASE WHEN n_items * n_items = sum_marg THEN NULL "
        f"ELSE (n_agree * n_items - sum_marg) * {MICRO} "
        "DIV (n_items * n_items - sum_marg) END AS kappa_micro",
    )


def cohens_kappa_oracle_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB mirror: same dedup, same join grain, same staged integer
    arithmetic."""
    return f"""
    WITH la AS (SELECT item, min(label) AS la FROM ({a_sql}) GROUP BY item),
    lb AS (SELECT item, min(label) AS lb FROM ({b_sql}) GROUP BY item),
    cells AS MATERIALIZED (
      SELECT la.la, lb.lb, CAST(count(*) AS BIGINT) AS c
      FROM la JOIN lb ON lb.item = la.item GROUP BY la.la, lb.lb),
    counts AS (
      SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_items,
             CAST(coalesce(sum(CASE WHEN la = lb THEN c END), 0)
                  AS BIGINT) AS n_agree
      FROM cells),
    marg AS (
      SELECT CAST(coalesce(sum(ma.ca * mb.cb), 0) AS BIGINT) AS sum_marg
      FROM (SELECT la, sum(c) AS ca FROM cells GROUP BY la) ma
      JOIN (SELECT lb, sum(c) AS cb FROM cells GROUP BY lb) mb
        ON mb.lb = ma.la)
    SELECT n_items, n_agree, sum_marg,
           n_agree * {MICRO} // n_items AS agree_micro,
           (sum_marg // n_items) * {MICRO} // n_items AS expected_micro,
           CASE WHEN n_items * n_items = sum_marg THEN NULL
                ELSE (n_agree * n_items - sum_marg) * {MICRO}
                     // (n_items * n_items - sum_marg) END AS kappa_micro
    FROM counts, marg
    WHERE n_items > 0
    """
