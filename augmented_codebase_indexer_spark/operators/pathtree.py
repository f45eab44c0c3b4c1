"""URL path-tree rollup — page counts per (host, path-prefix) at every
depth: the site-structure report every crawl review starts with
("/docs is 60% of the site, /tag/* is infinite"), and the evidence
base for section-level crawl rules (budget by subtree via
`operators/budget.py`, denylist a runaway calendar subtree, pick
chunking policy per section).

Each url contributes one row per ancestor prefix of its path, up to
``max_depth`` (documented cap — web paths are shallow, and the cap
bounds the explode fan-out to a constant).  Depth 0 is the host root
and counts every page of the host.

Exactness: pure string surgery (regexp_extract with a backslash-free
pattern, split on '/', slice + join) and BIGINT counts; the Spark
``slice(parts, 1, k)`` / DuckDB ``list_slice(parts, 1, k)`` endpoint
reconciliation is exact (both take elements 1..k; the repo's
documented 1-based-inclusive divergence only bites with non-1 starts).
Query strings and fragments never enter the prefix.

Scale shape at 10^10 urls: one bounded explode (≤ max_depth+1 rows per
url) feeding one (host, prefix) groupBy with map-side combine — prefix
cardinality is site-structure-sized, far below page count.  No joins,
no windows.

Reference anchor: the reference scans and reports per-directory file
counts (`src/aci/core/file_scanner/scanner.py` directory walk) — this
is the url-space form of that tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PATH_RE = "^[a-z]+://[^/?#]+(/[^?#]*)"


def url_path_rollup(
    pages: DataFrame, max_depth: int = 4, url_col: str = "url"
) -> DataFrame:
    """→ (host, prefix, depth, n_pages): page count per path prefix.
    ``prefix`` is '' at depth 0 (the host root), '/a' at depth 1,
    '/a/b' at depth 2, …; a url deeper than ``max_depth`` still counts
    toward every prefix it has up to the cap."""
    if not 1 <= max_depth <= 16:
        raise ValueError("url_path_rollup: max_depth must be in [1, 16]")
    u = pages.selectExpr(
        f"regexp_extract({url_col}, '^[a-z]+://([^/?#]+)', 1) AS host",
        f"regexp_extract({url_col}, '{_PATH_RE}', 1) AS path",
    ).filter(F.col("host") != "")
    segs = u.selectExpr(
        "host",
        # '/a/b/' splits to ['', 'a', 'b', ''] — drop empties
        "filter(split(path, '/'), x -> x <> '') AS parts",
    )
    return (
        segs.selectExpr(
            "host",
            "parts",
            f"explode(sequence(0, least(size(parts), {max_depth}))) AS depth",
        )
        .selectExpr(
            "host",
            "CASE WHEN depth = 0 THEN '' "
            "ELSE '/' || array_join(slice(parts, 1, depth), '/') END"
            " AS prefix",
            "CAST(depth AS BIGINT) AS depth",
        )
        .groupBy("host", "prefix", "depth")
        .agg(F.count("*").cast("long").alias("n_pages"))
    )


def url_path_rollup_sql(pages_sql: str, max_depth: int = 4) -> str:
    """DuckDB mirror: same regexes, same segment filter, same slice
    endpoints (1..k inclusive both engines), same rollup grain."""
    return f"""
    WITH u AS (
      SELECT regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
             regexp_extract(url, '{_PATH_RE}', 1) AS path
      FROM ({pages_sql})),
    segs AS (
      SELECT host,
             list_filter(string_split(path, '/'), x -> x <> '') AS parts
      FROM u WHERE host <> ''),
    e AS (
      SELECT host, parts,
             CAST(unnest(range(0, least(len(parts), {max_depth}) + 1))
                  AS BIGINT) AS depth
      FROM segs)
    SELECT host,
           CASE WHEN depth = 0 THEN ''
                ELSE '/' || array_to_string(
                       list_slice(parts, 1, depth), '/') END AS prefix,
           depth, CAST(count(*) AS BIGINT) AS n_pages
    FROM e GROUP BY 1, 2, 3
    """
