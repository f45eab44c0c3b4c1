"""Page-level HTML metadata — the per-page signals the index gate reads
before content is even considered: ``<title>``, ``rel="canonical"``
(RFC 6596 — the duplicate-cluster representative the SITE declares,
complementing the learned rules in `operators/urlparams.py`), the
robots meta directives (noindex/nofollow, the per-page half of RFC
9309's per-site gate in `operators/robots.py`), and ``http-equiv=
refresh`` client-side redirects (the soft-redirect tier below the HTTP
ones `operators/redirects.py` resolves).

All extraction is ``regexp_extract`` in whole-stage codegen over the
html string; the patterns are backslash-free (character classes only
— Spark SQL literals process backslashes, DuckDB's don't; a
class-based pattern is byte-identical in both engines) and
case-insensitive via the inline ``(?i)`` flag both regex engines
support.  No-match is normalized to NULL through ``NULLIF(·, '')``
(both engines return '' from regexp_extract on miss — probed).
Documented subset: attribute values must be double-quoted; canonical
accepts rel-before-href and href-before-rel attribute orders;
single-quoted or unquoted attributes surface as NULL, never an error.

Scale shape: one codegen projection per page — the html dies inside
the scan stage; only the slim metadata row crosses any exchange.

Reference anchor: the reference extracts per-file metadata (path,
language, hash) at scan time before content processing
(`src/aci/core/file_scanner/scanner.py`) — this is the web page's
equivalent header record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TITLE = "(?i)<title[^>]*>([^<]*)</title>"
_CANON_RH = '(?i)<link[^>]+rel="canonical"[^>]*href="([^"]*)"'
_CANON_HR = '(?i)<link[^>]+href="([^"]*)"[^>]*rel="canonical"'
_ROBOTS = '(?i)<meta[^>]+name="robots"[^>]*content="([^"]*)"'
_REFRESH = '(?i)<meta[^>]+http-equiv="refresh"[^>]*content="([^"]*)"'
_REFRESH_URL = "(?i)url=([^;\" ]+)"


def page_meta(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """→ (url, title, canonical, noindex, nofollow, refresh_url): the
    index-gate metadata row per page.  ``noindex``/``nofollow`` are
    false when no robots meta exists (the protocol default)."""
    h = F.col(html_col).cast("string")
    robots = F.lower(F.regexp_extract(h, _ROBOTS, 1))
    refresh = F.regexp_extract(h, _REFRESH, 1)
    return pages.select(
        F.col(url_col).alias("url"),
        F.nullif(F.regexp_extract(h, _TITLE, 1), F.lit("")).alias("title"),
        F.nullif(
            F.coalesce(
                F.nullif(F.regexp_extract(h, _CANON_RH, 1), F.lit("")),
                F.regexp_extract(h, _CANON_HR, 1),
            ),
            F.lit(""),
        ).alias("canonical"),
        robots.contains("noindex").alias("noindex"),
        robots.contains("nofollow").alias("nofollow"),
        F.nullif(F.regexp_extract(refresh, _REFRESH_URL, 1), F.lit(""))
        .alias("refresh_url"),
    )


def page_meta_sql(pages_sql: str) -> str:
    """DuckDB mirror: the SAME backslash-free patterns over the same
    html strings — regex parity is the point of this oracle (the
    asset-metadata tier proves arithmetic; this proves extraction)."""
    refresh = f"regexp_extract(html, '{_REFRESH}', 1)"
    robots = f"lower(regexp_extract(html, '{_ROBOTS}', 1))"
    # _REFRESH_URL carries a literal double quote inside its character
    # class — legal as-is inside the single-quoted SQL literal below
    rurl = _REFRESH_URL
    return f"""
    SELECT url,
           NULLIF(regexp_extract(html, '{_TITLE}', 1), '') AS title,
           NULLIF(coalesce(
             NULLIF(regexp_extract(html, '{_CANON_RH}', 1), ''),
             regexp_extract(html, '{_CANON_HR}', 1)), '') AS canonical,
           contains({robots}, 'noindex') AS noindex,
           contains({robots}, 'nofollow') AS nofollow,
           NULLIF(regexp_extract({refresh}, '{rurl}', 1), '')
             AS refresh_url
    FROM (SELECT url, CAST(html AS VARCHAR) AS html FROM ({pages_sql}))
    """


def canonical_edges(meta: DataFrame) -> DataFrame:
    """(url, canonical, …) → (src, dst): the non-trivial canonical
    declarations as a redirect-shaped edge relation — feed to
    `operators/redirects.py::resolve_redirects` to collapse canonical
    CHAINS (A→B→C: the page A's clean form is C) exactly like HTTP
    redirect chains; self-canonicals and absent declarations drop."""
    return meta.filter(
        F.col("canonical").isNotNull()
        & (F.col("canonical") != F.col("url"))
    ).select(F.col("url").alias("src"), F.col("canonical").alias("dst"))
