"""Column profiling — the data-quality metadata operator (null rates,
distinct counts, numeric ranges per column) a corpus pipeline runs before
and after every major transform to catch schema drift and silent data loss.

One pass over the table: every per-column statistic is an algebraic
aggregate (count/min/max/countDistinct expressed per column in a single
``agg``), so Catalyst executes ONE map-side-combined aggregation — no
per-column scans, no collect of data rows. Output is long-form
(column, metric, value) so profiles diff trivially across runs.

countDistinct on several columns in one agg expands to Spark's expand-node
plan (one shuffle); at 100 TB pass ``approx=True`` to swap exact distinct
for HLL (``approx_count_distinct``) per column — same single-pass operator
shape, and the choice is SELF-DOCUMENTING in the output (the metric is
named ``approx_distinct_count``), never silently approximated: the driver
oracle compares exact values, so the gated default stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """→ (column, metric, value: double) — n_rows, null_count,
    distinct_count per column; min/max for numeric columns. ``approx=True``
    replaces exact distinct with HLL at relative error ``approx_rsd`` and
    renames the metric ``approx_distinct_count`` (the 100 TB switch: no
    expand-node shuffle, constant memory per column)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    dst_metric = "approx_distinct_count" if approx else "distinct_count"
    numeric = set()
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nul__{c}"))
        aggs.append(
            (F.approx_count_distinct(F.col(c), rsd=approx_rsd) if approx
             else F.countDistinct(F.col(c))).alias(f"dst__{c}")
        )
        if isinstance(df.schema[c].dataType, NumericType):
            numeric.add(c)
            aggs.append(F.min(F.col(c)).cast("double").alias(f"min__{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"max__{c}"))
    row = df.agg(*aggs)
    # pivot the single stats row to long form — stack() on one row, no data
    # movement (the row is already on the driver-adjacent single partition)
    pairs = []
    for c in cols:
        pairs += [(c, "null_count", f"nul__{c}"), (c, dst_metric, f"dst__{c}")]
        if c in numeric:
            pairs += [(c, "min", f"min__{c}"), (c, "max", f"max__{c}")]
    stack_args = []
    for col_name, metric, field in pairs:
        stack_args += [f"'{col_name}'", f"'{metric}'", f"cast({field} as double)"]
    n = len(pairs)
    exploded = row.selectExpr(
        "cast(__n as double) as __rows",
        f"stack({n}, {', '.join(stack_args)}) as (column, metric, value)",
    )
    head = row.selectExpr(
        "'__table__' as column", "'n_rows' as metric", "cast(__n as double) as value"
    )
    return head.unionByName(exploded.select("column", "metric", "value"))


def profile_oracle_sql(table: str, columns: list[str], numeric: list[str]) -> str:
    """DuckDB mirror of ``profile_table`` for the given column lists."""
    selects = [f"SELECT '__table__' AS \"column\", 'n_rows' AS metric, "
               f"CAST(count(*) AS DOUBLE) AS value FROM {table}"]
    for c in columns:
        selects.append(
            f"SELECT '{c}', 'null_count', CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM {table}"
        )
        selects.append(
            f"SELECT '{c}', 'distinct_count', CAST(count(DISTINCT {c}) AS DOUBLE) FROM {table}"
        )
        if c in numeric:
            selects.append(f"SELECT '{c}', 'min', CAST(min({c}) AS DOUBLE) FROM {table}")
            selects.append(f"SELECT '{c}', 'max', CAST(max({c}) AS DOUBLE) FROM {table}")
    return "\nUNION ALL\n".join(selects)
