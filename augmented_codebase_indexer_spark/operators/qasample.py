"""Deterministic stratified QA sampling — k rows per stratum, chosen
by hash rank, reproducible forever.

The human-review loop ("send 50 facts per predicate to annotators
every week") needs samples that are (a) quota-exact per stratum,
(b) unbiased w.r.t. anything the pipeline computes, and (c) STABLE —
re-running the job must pick the same rows, or week-over-week review
diffs are noise. Random sampling fails (c) and Spark's ``sample()``
fails (a); the standard fix is hash ranking (the md5-order trick
`training_mix` already uses for budgeted mixing — Rivest's
"hash-and-take-smallest" consistent sampling): order each stratum by
``md5(row id)`` and keep the first k. The hash is uniform and
uncorrelated with content, the quota is exact, and the same corpus
always yields the same sample; NEW rows displace old ones only where
their hash lands in the top-k — review churn ∝ corpus churn.

Scale shape: one hash projection + one stratum-partitioned top-k
window planned as WindowGroupLimit (only k rows per stratum survive
the exchange) — the same rank-pushdown shape as the fact summarizer.

Reference anchor: the reference spot-checks indexed chunks per
language with a fixed seed (`tests/` fixtures); this is the
warehouse-grain form with no RNG state at all.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SEP = "\x01"


def stratified_sample(
    df: DataFrame,
    stratum_cols: Sequence[str],
    id_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """→ input columns + (sample_rank): the k hash-smallest rows per
    stratum; ties (duplicate ids) break on the id columns."""
    h = F.md5(F.concat_ws(_SEP, *[F.col(c) for c in id_cols]))
    w = Window.partitionBy(*stratum_cols).orderBy(
        h, *[F.col(c) for c in id_cols])
    return (
        df.withColumn(
            "sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def stratified_sample_oracle_sql(
    df_sql: str,
    stratum_cols: Sequence[str],
    id_cols: Sequence[str],
    k: int,
) -> str:
    """DuckDB mirror (md5 + concat_ws are bit-identical across the
    engines — the hll/training_mix shared-expression discipline)."""
    strata = ", ".join(stratum_cols)
    ids = ", ".join(id_cols)
    h = f"md5(concat_ws(chr(1), {ids}))"
    return f"""
    SELECT * FROM (
      SELECT *, CAST(row_number() OVER (
          PARTITION BY {strata} ORDER BY {h}, {ids}) AS BIGINT)
        AS sample_rank
      FROM ({df_sql}))
    WHERE sample_rank <= {k}
    """
