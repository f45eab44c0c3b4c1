"""Crawl-frontier assembly — canonicalize → robots gate → politeness slots.

The stage every crawler runs between "candidate URLs discovered" and
"fetch queue": normalize each candidate to its canonical form (RFC 3986
syntax + tracking-param strip — the URL-level dedup key), drop
duplicates of the canonical form, keep only robots-allowed urls
(RFC 9309), cap per host, and assign each url its per-host POLITENESS
SLOT — the 1-based fetch position within its host, because a polite
crawler fetches one url per host per delay window (the Mercator
frontier design, Heydon & Najork WWW'99). The reference's analog is the
scan-phase deny/ignore gate ahead of indexing (`core/file_scanner`);
the web form adds the politeness ordering.

Composition, not new machinery: :func:`operators.urlnorm.
with_canonical_url` + :func:`operators.robots.apply_robots` +
:func:`operators.domains.host_col` + one host-partitioned
``row_number``. The slot window is the semantics, not a compromise —
per-host fetch order is inherently sequential — and ``per_host_cap``
bounds it: Spark plans ``row_number ≤ k`` as WindowGroupLimit
(partial + final), so each host's state is O(cap) on BOTH sides of the
exchange; the hot-host skew a raw window would have is capped by the
same quota a real frontier enforces anyway.

All outputs are strings/BIGINT; the DuckDB mirror composes the same
three stage oracles, so the gate is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .domains import host_col, host_sql_expr
from .robots import apply_robots, apply_robots_oracle_sql
from .urlnorm import canonical_url_sql, with_canonical_url


def crawl_frontier(
    candidates: DataFrame,
    rules: DataFrame,
    agent: str = "aci-bot",
    per_host_cap: int | None = None,
    url_col: str = "url",
) -> DataFrame:
    """candidates(url, …) + parsed robots rules → (url, host, slot).

    ``url`` is the canonical form (deduped), ``slot`` the 1-based
    per-host fetch position ordered by url; urls past ``per_host_cap``
    are dropped (the per-host crawl quota)."""
    canon = (
        with_canonical_url(candidates.select(F.col(url_col).alias("url")))
        .select(F.col("canon_url").alias("url"))
        .distinct()
    )
    allowed = (
        apply_robots(canon, rules, agent=agent)
        .filter(F.col("robots_allowed"))
        .select("url")
    )
    hosted = allowed.withColumn("host", host_col(F.col("url")))
    w = Window.partitionBy("host").orderBy("url")
    slotted = hosted.withColumn("slot", F.row_number().over(w).cast("long"))
    if per_host_cap is not None:
        slotted = slotted.filter(F.col("slot") <= per_host_cap)
    return slotted.select("url", "host", "slot")


def crawl_frontier_oracle_sql(
    candidates_sql: str,
    robots_sql: str,
    agent: str = "aci-bot",
    per_host_cap: int | None = None,
) -> str:
    """DuckDB mirror: the same three stage oracles composed (canonical
    expression → robots verdict CTE nested as a subquery → slot window)."""
    cap = f"WHERE slot <= {per_host_cap}" if per_host_cap is not None else ""
    verdict = apply_robots_oracle_sql("SELECT url FROM canon", robots_sql, agent)
    return f"""
    WITH cands AS ({candidates_sql}),
    canon AS (
      SELECT DISTINCT {canonical_url_sql("url")} AS url FROM cands),
    verdicts AS (SELECT * FROM ({verdict}) v),
    hosted AS (
      SELECT url, {host_sql_expr("url")} AS host
      FROM verdicts WHERE robots_allowed),
    slotted AS (
      SELECT url, host,
             CAST(row_number() OVER (PARTITION BY host ORDER BY url)
                  AS BIGINT) AS slot
      FROM hosted)
    SELECT url, host, slot FROM slotted {cap}
    """
