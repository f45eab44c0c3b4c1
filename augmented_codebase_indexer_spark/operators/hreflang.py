"""hreflang alternate extraction + reciprocity QA — the multilingual
cluster declarations (`<link rel="alternate" hreflang="x" href="y">`,
per Google's hreflang spec and RFC 8288 link relations) that tell a
crawler "these N urls are the same page in N languages".  Clusters
drive dedup policy (language variants are NOT near-dup spam), locale
routing, and per-language corpus slicing — but the protocol requires
RECIPROCITY: if A declares B as an alternate, B must declare A back,
else the annotation is ignored (the single most common hreflang
deployment bug).  The QA half surfaces exactly those violations.

Extraction mirrors `operators/pagemeta.py`: backslash-free case-
insensitive patterns over the html string, one ``regexp_extract_all``
+ positional explode, both attribute orders accepted (hreflang-first
and href-first), self-referencing alternates kept (the spec wants
them).

Exactness: strings and BIGINT counts only; the reciprocity verdict is
one reversed-key left-anti join over the distinct (url, alt_url) edge
set — `operators/kgquality.py::symmetry_violations`' shape applied to
the alternate graph (hreflang codes may differ per direction; the
spec's requirement is the LINK back, so the check ignores the code).

Scale shape: html dies inside the scan; the alternate relation is
links-per-page-bounded; the reciprocity anti-join is one slim
(url, alt_url)-keyed exchange.

Reference anchor: the reference validates symlink targets exist before
indexing them (`src/aci/core/symlink_validator.py`) — reciprocity is
the web's version of "does the other end acknowledge this link".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALT = '(?i)<link[^>]+rel="alternate"[^>]*>'
_LANG = '(?i)hreflang="([^"]*)"'
_HREF = '(?i)href="([^"]*)"'


def hreflang_alternates(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """→ (url, hreflang, alt_url): every declared alternate; fragments
    missing either attribute drop (malformed markup, never an error)."""
    h = F.col(html_col).cast("string")
    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.explode(F.regexp_extract_all(h, F.lit(_ALT), 0)).alias("frag"),
        )
        .selectExpr(
            "url",
            f"nullif(lower(regexp_extract(frag, '{_LANG}', 1)), '')"
            " AS hreflang",
            f"nullif(regexp_extract(frag, '{_HREF}', 1), '') AS alt_url",
        )
        .filter(F.col("hreflang").isNotNull() & F.col("alt_url").isNotNull())
    )


def hreflang_reciprocity(alternates: DataFrame) -> DataFrame:
    """→ (url, hreflang, alt_url, reciprocal): the distinct alternate
    edges, each flagged by whether the target declares ANY alternate
    back to the source (the spec's validity condition).  Self-
    references are reciprocal by definition."""
    alts = alternates.select("url", "hreflang", "alt_url").distinct()
    back = alts.select(
        F.col("alt_url").alias("url"), F.col("url").alias("alt_url")
    ).distinct()
    return (
        alts.join(
            back.withColumn("_back", F.lit(True)), ["url", "alt_url"], "left"
        )
        .selectExpr(
            "url", "hreflang", "alt_url",
            "url = alt_url OR coalesce(_back, false) AS reciprocal",
        )
    )


def hreflang_reciprocity_sql(pages_sql: str) -> str:
    """DuckDB mirror: same patterns, same distinct edge grain, same
    reciprocity join."""
    return f"""
    WITH f AS (
      SELECT url,
             unnest(regexp_extract_all(CAST(html AS VARCHAR), '{_ALT}'))
               AS frag
      FROM ({pages_sql})),
    alts AS MATERIALIZED (
      SELECT DISTINCT url,
             NULLIF(lower(regexp_extract(frag, '{_LANG}', 1)), '')
               AS hreflang,
             NULLIF(regexp_extract(frag, '{_HREF}', 1), '') AS alt_url
      FROM f
      WHERE NULLIF(lower(regexp_extract(frag, '{_LANG}', 1)), '')
              IS NOT NULL
        AND NULLIF(regexp_extract(frag, '{_HREF}', 1), '') IS NOT NULL),
    back AS (SELECT DISTINCT alt_url AS url, url AS alt_url FROM alts)
    SELECT a.url, a.hreflang, a.alt_url,
           a.url = a.alt_url OR b.url IS NOT NULL AS reciprocal
    FROM alts a
    LEFT JOIN back b ON b.url = a.url AND b.alt_url = a.alt_url
    """
