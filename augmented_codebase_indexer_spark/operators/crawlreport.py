"""Host crawl-health report — the per-host operations fold joining the
crawl stack's three independent screens into one triage table.

A crawl operator looks at hosts, not urls: is this host a TRAP
(URL-aliasing profile, `operators/traps.py`), can its queue DRAIN
inside the crawl window under its politeness delay
(`operators/schedule.py::host_drain`), and did the budget
apportionment leave it any slots (`operators/budget.py`)? Each screen
is independently oracle-gated; this fold is a full-outer join at host
grain plus the triage flag

    needs_attention = trap OR NOT fits_window OR alloc = 0

— a host missing from a screen contributes NULLs, never a fabricated
healthy default (trap_flag NULL ≠ false in the output; only the flag
coalesces, and each coalesce is visible in the expression).

Scale shape: three host-grain relations (each already folded from its
data-sized input by its own operator) joined on the host key — the
report itself never touches url-grain data.

Reference anchor: the reference's `get_index_status` aggregates
per-table health; this is the per-host crawl form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FLAG = ("coalesce(trap_flag, false)"
         " OR NOT coalesce(fits_window, true)"
         " OR coalesce(alloc, CAST(0 AS BIGINT)) = 0")


def host_crawl_report(
    profile: DataFrame, drain: DataFrame, alloc: DataFrame
) -> DataFrame:
    """url_alias_profile × host_drain × crawl_budget → one row per
    host appearing in ANY screen."""
    p = profile.select(
        "host", F.col("n_urls").alias("crawled_urls"),
        "alias_micro", "trap_flag")
    d = drain.select(
        "host", F.col("n_urls").alias("queued_urls"),
        "delay_ms", "drain_ms", "overflow_urls", "fits_window")
    a = alloc.select("host", "n_pages", "alloc")
    return (
        p.join(d, "host", "full_outer")
        .join(a, "host", "full_outer")
        .selectExpr(
            "host", "crawled_urls", "alias_micro", "trap_flag",
            "queued_urls", "delay_ms", "drain_ms", "overflow_urls",
            "fits_window", "n_pages", "alloc",
            f"{_FLAG} AS needs_attention",
        )
    )


def host_crawl_report_oracle_sql(
    profile_sql: str, drain_sql: str, alloc_sql: str
) -> str:
    """DuckDB mirror composing the three screens' own mirrors."""
    return f"""
    WITH p AS MATERIALIZED (
      SELECT host, n_urls AS crawled_urls, alias_micro, trap_flag
      FROM ({profile_sql})),
    d AS MATERIALIZED (
      SELECT host, n_urls AS queued_urls, delay_ms, drain_ms,
             overflow_urls, fits_window
      FROM ({drain_sql})),
    a AS MATERIALIZED (SELECT host, n_pages, alloc FROM ({alloc_sql})),
    pd AS (
      SELECT coalesce(p.host, d.host) AS host, crawled_urls,
             alias_micro, trap_flag, queued_urls, delay_ms, drain_ms,
             overflow_urls, fits_window
      FROM p FULL OUTER JOIN d ON p.host = d.host)
    SELECT coalesce(pd.host, a.host) AS host, crawled_urls,
           alias_micro, trap_flag, queued_urls, delay_ms, drain_ms,
           overflow_urls, fits_window, n_pages, alloc,
           {_FLAG} AS needs_attention
    FROM pd FULL OUTER JOIN a ON pd.host = a.host
    """
