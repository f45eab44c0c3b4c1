"""Crawl-trap detection — per-host URL-aliasing profile over fetched
content hashes.

Spider traps (calendar pages, session-id paths, faceted-search
explosions) are hosts where the crawler keeps finding NEW urls that
serve ALREADY-SEEN content: the distinct-url/distinct-content ratio per
host is the classic detection signal (Heydon & Najork WWW'99 §"crawler
traps"; Manning IR ch.20 calls the same quantity out as the duplicate
trap heuristic). The operator folds a (url, content_hash) fetch
relation to one row per host:

    n_urls, n_hashes, alias_micro = n_urls·1e6 DIV n_hashes,
    max_urls_per_hash, and the boolean trap flag
    (alias_micro ≥ threshold AND n_urls ≥ min_urls — small hosts can't
    witness a trap).

``max_urls_per_hash`` separates the uniform-mirror case (every page
duplicated once, alias ≈ 2.0) from the true trap (ONE content row
reachable under thousands of urls). All outputs BIGINT/bool by
construction — counts and one truncating division, no float.

Scale shape at 10^10 fetch rows: exact-pair dedup, one (host, hash)
aggregate (map-side combined — url text dies there), one host-keyed
fold. No window, no join; the trap flag feeds the frontier's per-host
cap and the budget stage directly.

Reference anchor: the reference's scanner dedups re-walked paths by
content hash before re-indexing (`core/file_scanner/scanner.py`) — this
is the host-grain web form of the same observation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .domains import host_col, host_sql_expr

MICRO = 1_000_000


def url_alias_profile(
    fetches: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
    trap_alias_micro: int = 4 * MICRO,
    min_urls: int = 20,
) -> DataFrame:
    """(url, content_hash) fetches → one aliasing row per host."""
    # one row per url (min hash — deterministic snapshot of url→content;
    # a refetched-and-changed url must not count as two urls)
    pairs = (
        fetches.select(
            F.col(url_col).alias("url"), F.col(hash_col).alias("h")
        )
        .groupBy("url")
        .agg(F.min("h").alias("h"))
        .withColumn("host", host_col(F.col("url")))
    )
    per_hash = pairs.groupBy("host", "h").agg(
        F.count("*").cast("long").alias("urls_for_hash")
    )
    return (
        per_hash.groupBy("host")
        .agg(
            F.sum("urls_for_hash").alias("n_urls"),
            F.count("*").cast("long").alias("n_hashes"),
            F.max("urls_for_hash").alias("max_urls_per_hash"),
        )
        .selectExpr(
            "host", "n_urls", "n_hashes", "max_urls_per_hash",
            f"n_urls * {MICRO} DIV n_hashes AS alias_micro",
        )
        .selectExpr(
            "host", "n_urls", "n_hashes", "max_urls_per_hash", "alias_micro",
            f"alias_micro >= {trap_alias_micro} AND n_urls >= {min_urls}"
            " AS trap_flag",
        )
    )


def url_alias_profile_oracle_sql(
    fetches_sql: str,
    trap_alias_micro: int = 4 * MICRO,
    min_urls: int = 20,
) -> str:
    """DuckDB mirror of :func:`url_alias_profile` (fetches_sql must
    expose url, content_hash)."""
    return f"""
    WITH pairs AS (
      SELECT url, h, {host_sql_expr("url")} AS host
      FROM (SELECT url, min(content_hash) AS h
            FROM ({fetches_sql}) GROUP BY url)),
    per_hash AS (
      SELECT host, h, CAST(count(*) AS BIGINT) AS urls_for_hash
      FROM pairs GROUP BY host, h),
    agg AS (
      SELECT host, sum(urls_for_hash) AS n_urls,
             CAST(count(*) AS BIGINT) AS n_hashes,
             max(urls_for_hash) AS max_urls_per_hash
      FROM per_hash GROUP BY host)
    SELECT host, n_urls, n_hashes, max_urls_per_hash,
           n_urls * {MICRO} // n_hashes AS alias_micro,
           (n_urls * {MICRO} // n_hashes) >= {trap_alias_micro}
             AND n_urls >= {min_urls} AS trap_flag
    FROM agg
    """
