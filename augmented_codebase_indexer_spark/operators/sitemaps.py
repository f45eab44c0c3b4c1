"""Sitemap parsing and changed-since recrawl selection.

sitemaps.org XML (the de-facto crawl contract beside robots.txt) lists
each site's urls with optional ``<lastmod>`` stamps; a crawler diffs
those stamps against its fetch log to recrawl ONLY what changed — the
incremental-crawl primitive (the reference's analog is the
content-hash diff in its incremental update path, here applied BEFORE
fetching instead of after).

* :func:`parse_sitemap` — (domain, xml) → (domain, loc, lastmod_epoch):
  ``<url>`` blocks via one codegen ``regexp_extract_all`` explode, loc/
  lastmod per block; lastmod accepts the sitemaps.org-allowed W3C
  datetime forms — date-only ``yyyy-MM-dd`` plus full datetimes
  ``yyyy-MM-ddTHH:mm[:ss]`` with a ``Z``/``±hh:mm`` zone — parsed to
  epoch seconds in UTC via ``try_to_timestamp`` (ADVICE r5: plain
  ``to_timestamp`` under Spark 4's ANSI default THROWS on any other
  form, e.g. '2026-01-02T03:04:05+00:00', killing the nightly
  refresh_crawl planner on common real-world sitemaps). Missing or
  unparseable lastmod surfaces as NULL, never drops the url and never
  fails the task.
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
    # sitemaps.org allows any W3C datetime; try the common forms in
    # specificity order — try_to_timestamp yields NULL (not an ANSI
    # exception) on mismatch, so one url's odd stamp can't kill the job
    parsed = F.coalesce(
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mmXXX")),
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd")),
    )
    return blocks.select(
        "domain",
        F.regexp_extract("block", _LOC_RE, 1).alias("loc"),
        F.when(lastmod != "", parsed.cast("long")).alias("lastmod_epoch"),
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


_SM_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"


def parse_sitemapindex(
    indexes: DataFrame, url_col: str = "index_url", xml_col: str = "xml"
) -> DataFrame:
    """(index_url, xml) → (index_url, sitemap_url, lastmod_epoch):
    sitemap INDEX files (sitemaps.org: a site over 50k urls/50MB must
    shard into child sitemaps listed by a ``<sitemapindex>``) — the
    missing recursion level above :func:`parse_sitemap`; the composed
    chain is robots → sitemapindex → sitemap → changed-since recrawl.
    Same leniency contract: missing/unparseable ``<lastmod>`` is NULL,
    entries without ``<loc>`` drop, one malformed child never fails
    the scan.  Plan shape: one codegen explode per index file, no
    exchange beyond the consumer's."""
    blocks = indexes.select(
        F.col(url_col).alias("index_url"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_SM_BLOCK_RE), F.lit(1))
        ).alias("block"),
    )
    lastmod = F.regexp_extract("block", _LASTMOD_RE, 1)
    parsed = F.coalesce(
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mmXXX")),
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd")),
    )
    return blocks.select(
        "index_url",
        F.regexp_extract("block", _LOC_RE, 1).alias("sitemap_url"),
        F.when(lastmod != "", parsed.cast("long")).alias("lastmod_epoch"),
    ).filter(F.col("sitemap_url") != "")


def parse_sitemapindex_sql(indexes_sql: str) -> str:
    """DuckDB mirror with the SAME regexes (lazy groups probed equal in
    RE2); lastmod epoch via the UTC-session strptime forms the
    sitemap_recrawl oracle already uses."""
    ts = ("coalesce("
          "try_strptime(lm, '%Y-%m-%dT%H:%M:%S%z'), "
          "try_strptime(lm, '%Y-%m-%dT%H:%M%z'), "
          "try_strptime(lm, '%Y-%m-%d'))")
    return f"""
    WITH b AS (
      SELECT index_url,
             unnest(regexp_extract_all(xml,
               '(?s)<sitemap>(.*?)</sitemap>', 1)) AS block
      FROM ({indexes_sql})),
    x AS (
      SELECT index_url,
             regexp_extract(block, '(?s)<loc>(.*?)</loc>', 1)
               AS sitemap_url,
             regexp_extract(block, '(?s)<lastmod>(.*?)</lastmod>', 1)
               AS lm
      FROM b)
    SELECT index_url, sitemap_url,
           CASE WHEN lm <> ''
                THEN CAST(epoch({ts}) AS BIGINT) END AS lastmod_epoch
    FROM x WHERE sitemap_url <> ''
    """
