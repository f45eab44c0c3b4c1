"""Crawl-budget apportionment — dividing a fixed recrawl budget across
hosts proportionally to their page counts with NO fractional seats:
Hamilton's largest-remainder method (the census-apportionment
classic; Balinski & Young, "Fair Representation", 1982).  Every
crawler faces this nightly: B fetch slots, hosts of wildly different
sizes, and the allocation must be integers that sum EXACTLY to B —
naive rounding under- or over-shoots, floats make two engines
disagree about who gets the last slot.

Hamilton's method is exactly integer: quota numerator ``q = B·n_h``,
base share ``q DIV N``, and the ``B − Σ base`` leftover slots go to
the hosts with the largest remainders ``q % N`` (host id breaks
remainder ties deterministically).  The allocation provably sums to B
and satisfies quota (each host gets ⌊quota⌋ or ⌈quota⌉).

Exactness: BIGINT throughout — products bounded by B·N (documented:
exact while B·max(n_h) < 2^63, i.e. any realistic budget).  The only
ordering is ONE unpartitioned window over the HOST table (host-
vocabulary-sized — the negatives.py indexing trade, never raw pages).

Scale shape: input is already the per-host aggregate (one map-side-
combinable groupBy upstream); everything here is host-cardinality-
sized.  10^12 pages reduce to 10^6-ish hosts before this operator
sees them.

Reference anchor: the reference debounces and batches its watch-cycle
work per directory (`src/aci/core/debouncer.py`) — this is the
budgeted, provably-fair version of "who gets processed this cycle".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def crawl_budget(
    host_counts: DataFrame,
    budget: int,
    host_col: str = "host",
    count_col: str = "n_pages",
) -> DataFrame:
    """→ (host, n_pages, base, remainder, alloc): Hamilton largest-
    remainder allocation of ``budget`` slots; Σ alloc = budget exactly
    (asserted by the method, tested).  Hosts with n_pages ≤ 0 drop."""
    if budget < 0:
        raise ValueError("crawl_budget: budget must be >= 0")
    from augmented_codebase_indexer_spark.operators.guards import (
        register_pin,
    )

    # pin the host frame: it feeds the total, the quota projection and
    # (through q) the ranking and the leftover fold — unpinned, the
    # upstream per-host aggregation re-executes per consumer
    h = register_pin(
        host_counts.select(
            F.col(host_col).alias("host"),
            F.col(count_col).cast("long").alias("n_pages"),
        )
        .filter(F.col("n_pages") > 0)
        .persist()
    )
    tot = h.agg(F.sum("n_pages").alias("n_total"))
    q = register_pin(
        h.crossJoin(F.broadcast(tot)).selectExpr(
            "host", "n_pages", "n_total",
            f"(n_pages * {budget}) DIV n_total AS base",
            f"(n_pages * {budget}) % n_total AS remainder",
        ).persist()
    )
    w = Window.orderBy(F.col("remainder").desc(), F.col("host").asc())
    ranked = q.withColumn("_rk", F.row_number().over(w).cast("long"))
    leftover = q.agg(
        (F.lit(budget) - F.coalesce(F.sum("base"), F.lit(0))).alias("_extra")
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .selectExpr(
            "host", "n_pages", "base", "remainder",
            "base + CASE WHEN _rk <= _extra THEN 1 ELSE 0 END AS alloc",
        )
    )


def crawl_budget_oracle_sql(host_counts_sql: str, budget: int) -> str:
    """DuckDB mirror: same quota arithmetic, same remainder ranking,
    same host tie-break."""
    return f"""
    WITH h AS (
      SELECT host, CAST(n_pages AS BIGINT) AS n_pages
      FROM ({host_counts_sql}) WHERE n_pages > 0),
    tot AS (SELECT sum(n_pages) AS n_total FROM h),
    q AS MATERIALIZED (
      SELECT host, n_pages,
             (n_pages * {budget}) // n_total AS base,
             (n_pages * {budget}) % n_total AS remainder
      FROM h CROSS JOIN tot),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
        ORDER BY remainder DESC, host ASC) AS BIGINT) AS _rk
      FROM q),
    leftover AS (
      SELECT {budget} - coalesce(sum(base), 0) AS _extra FROM q)
    SELECT host, n_pages, base, remainder,
           base + CASE WHEN _rk <= _extra THEN 1 ELSE 0 END AS alloc
    FROM ranked CROSS JOIN leftover
    """
