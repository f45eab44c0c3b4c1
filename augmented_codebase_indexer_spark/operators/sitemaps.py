"""Sitemap parsing and changed-since recrawl selection.

sitemaps.org XML (the de-facto crawl contract beside robots.txt) lists
each site's urls with optional ``<lastmod>`` stamps; a crawler diffs
those stamps against its fetch log to recrawl ONLY what changed — the
incremental-crawl primitive (the reference's analog is the
content-hash diff in its incremental update path, here applied BEFORE
fetching instead of after).

* :func:`parse_sitemap` — (domain, xml) → (domain, loc, lastmod_epoch):
  ``<url>`` blocks via one codegen ``regexp_extract_all`` explode, loc/
  lastmod per block; lastmod is a date (``yyyy-MM-dd``, the sitemaps.org
  minimum form) parsed to epoch seconds in UTC (the session timezone —
  ``session.py`` pins UTC so both engines agree). Missing/unparseable
  lastmod surfaces as NULL, never drops the url.
* :func:`recrawl_candidates` — sitemap entries ⟕ fetch log:
  never-fetched urls are ``new``; fetched urls whose lastmod is STRICTLY
  newer than fetched_at are ``modified``; fetched urls with NULL lastmod
  are skipped (documented choice: without a stamp there is no change
  evidence — changefreq heuristics are out of scope). One url-keyed
  join of slim (url, epoch) rows.

All outputs strings/BIGINT — exact DuckDB mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_LOC_RE = r"(?s)<loc>(.*?)</loc>"
_LASTMOD_RE = r"(?s)<lastmod>(.*?)</lastmod>"


def parse_sitemap(
    sitemaps: DataFrame, domain_col: str = "domain", xml_col: str = "xml"
) -> DataFrame:
    """(domain, xml) → (domain, loc, lastmod_epoch BIGINT nullable)."""
    blocks = sitemaps.select(
        F.col(domain_col).alias("domain"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK_RE), F.lit(1))
        ).alias("block"),
    )
    lastmod = F.regexp_extract("block", _LASTMOD_RE, 1)
    return blocks.select(
        "domain",
        F.regexp_extract("block", _LOC_RE, 1).alias("loc"),
        F.when(
            lastmod != "",
            F.to_timestamp(lastmod, "yyyy-MM-dd").cast("long"),
        ).alias("lastmod_epoch"),
    ).filter(F.col("loc") != "")


def recrawl_candidates(
    entries: DataFrame, fetch_log: DataFrame
) -> DataFrame:
    """entries(loc, lastmod_epoch) ⟕ fetch_log(url, fetched_at) →
    (url, lastmod_epoch, fetched_at, reason ∈ {new, modified})."""
    log = fetch_log.select(
        F.col("url").alias("loc"), F.col("fetched_at").cast("long")
    )
    j = entries.select("loc", "lastmod_epoch").join(log, "loc", "left")
    reason = F.when(F.col("fetched_at").isNull(), F.lit("new")).when(
        F.col("lastmod_epoch") > F.col("fetched_at"), F.lit("modified")
    )
    return (
        j.withColumn("reason", reason)
        .filter(F.col("reason").isNotNull())
        .select(
            F.col("loc").alias("url"), "lastmod_epoch", "fetched_at", "reason"
        )
    )


def recrawl_candidates_sql(entries_sql: str, fetch_log_sql: str) -> str:
    """DuckDB mirror over closed-form (loc, lastmod_epoch) and
    (url, fetched_at) relations."""
    return f"""
    WITH e AS ({entries_sql}),
    log AS (SELECT url AS loc, CAST(fetched_at AS BIGINT) AS fetched_at
            FROM ({fetch_log_sql})),
    j AS (SELECT e.loc, e.lastmod_epoch, log.fetched_at
          FROM e LEFT JOIN log ON log.loc = e.loc),
    r AS (SELECT *,
            CASE WHEN fetched_at IS NULL THEN 'new'
                 WHEN lastmod_epoch > fetched_at THEN 'modified'
                 ELSE NULL END AS reason
          FROM j)
    SELECT loc AS url, CAST(lastmod_epoch AS BIGINT) AS lastmod_epoch,
           fetched_at, reason
    FROM r WHERE reason IS NOT NULL
    """
