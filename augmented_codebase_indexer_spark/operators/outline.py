"""Heading-outline extraction — the h1-h3 section tree of a page, each
heading with its document-order position and its PARENT (the nearest
preceding heading of a shallower level).  Section trees are what make
chunking section-aware (`operators/chunking.py` slices flat text; a
heading path like "API > Auth > Tokens" is the retrieval-time context
header every RAG pipeline wants) and give KG extraction a subject
scope (facts under an entity's heading attach to that entity).

Extraction is one ``regexp_extract_all`` of the backslash-free pattern
``<h([1-3])[^>]*>([^<]*)</h[1-3]>`` (case-insensitive; mismatched
open/close levels are accepted by the class-based close tag —
documented leniency) followed by a positional explode; level and text
re-extract per fragment in the same codegen stage.

Parent assignment needs no self-join: with three levels, the nearest
shallower predecessor is ``CASE level WHEN 1 → NULL, 2 → last h1,
3 → greatest(last h1, last h2)`` where "last hK" is a running
``max(CASE level=K THEN pos END)`` over the preceding rows of ONE
url-partitioned window — the greatest of the per-level maxima IS the
nearest shallower heading, because positions increase.

Exactness: positions are 0-based BIGINTs from the explode ordinal;
every gated column is integer/string; no floats anywhere.

Scale shape: the html dies inside the scan projection; the window
partitions by url with headings-per-page state (tiny).  10^10 pages
cost one scan + one url-keyed exchange of heading rows.

Reference anchor: the reference's chunker respects declaration
boundaries when slicing files (`src/aci/core/chunker/chunker.py`) —
headings are the web document's declaration boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_H_RE = "(?i)<h([1-3])[^>]*>([^<]*)</h[1-3]>"


def heading_outline(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """→ (url, pos, level, text, parent_pos): every h1-h3 heading in
    document order with its nearest-shallower parent's position (NULL
    for h1 and for an h2/h3 preceding any shallower heading)."""
    h = F.col(html_col).cast("string")
    frags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.regexp_extract_all(h, F.lit(_H_RE), 0))
        .alias("pos", "frag"),
    ).select(
        "url",
        F.col("pos").cast("long").alias("pos"),
        F.expr(f"try_cast(regexp_extract(frag, '{_H_RE}', 1) AS BIGINT)")
        .alias("level"),
        F.regexp_extract("frag", _H_RE, 2).alias("text"),
    )
    prec = (
        "OVER (PARTITION BY url ORDER BY pos "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    return frags.selectExpr(
        "url", "pos", "level", "text",
        f"max(CASE WHEN level = 1 THEN pos END) {prec} AS _h1",
        f"max(CASE WHEN level = 2 THEN pos END) {prec} AS _h2",
    ).selectExpr(
        "url", "pos", "level", "text",
        "CASE level WHEN 1 THEN CAST(NULL AS BIGINT) "
        "WHEN 2 THEN _h1 "
        "ELSE greatest(coalesce(_h1, -1), coalesce(_h2, -1)) END"
        " AS _p",
    ).selectExpr(
        "url", "pos", "level", "text",
        "CASE WHEN _p IS NULL OR _p < 0 THEN NULL ELSE _p END"
        " AS parent_pos",
    )


def heading_outline_sql(pages_sql: str) -> str:
    """DuckDB mirror: parallel unnests zip fragment with ordinal (the
    robots-oracle precedent — no WITH ORDINALITY in DuckDB), then the
    same per-level running-max parent assignment."""
    return f"""
    WITH f AS (
      SELECT url, regexp_extract_all(CAST(html AS VARCHAR), '{_H_RE}')
               AS frags
      FROM ({pages_sql})),
    e AS (
      SELECT url, CAST(unnest(range(0, len(frags))) AS BIGINT) AS pos,
             unnest(frags) AS frag
      FROM f),
    t AS (
      SELECT url, pos,
             TRY_CAST(regexp_extract(frag, '{_H_RE}', 1) AS BIGINT)
               AS level,
             regexp_extract(frag, '{_H_RE}', 2) AS text
      FROM e),
    w AS (
      SELECT url, pos, level, text,
             max(CASE WHEN level = 1 THEN pos END) OVER (
               PARTITION BY url ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS _h1,
             max(CASE WHEN level = 2 THEN pos END) OVER (
               PARTITION BY url ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS _h2
      FROM t)
    SELECT url, pos, level, text,
           CASE WHEN level = 1 THEN NULL
                WHEN level = 2 THEN _h1
                WHEN greatest(coalesce(_h1, -1), coalesce(_h2, -1)) < 0
                  THEN NULL
                ELSE greatest(coalesce(_h1, -1), coalesce(_h2, -1)) END
             AS parent_pos
    FROM w
    """
