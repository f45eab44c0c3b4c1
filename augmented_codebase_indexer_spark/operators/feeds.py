"""RSS/Atom feed parsing — the push side of URL discovery.

Sitemaps enumerate a site; feeds announce what's NEW — the other half
of the discovery stack every crawler polls (RSS 2.0 / Atom RFC 4287).
The reference's analog is the watch source (filesystem events as the
push channel); the web form parses the feed document instead.

One codegen scan per feed: item blocks (``<item>`` for RSS,
``<entry>`` for Atom — both matched) via ``regexp_extract_all``
explode, then per-item link/title/pubDate. Links come from either
``<link>text</link>`` (RSS) or ``<link href="..."/>`` (Atom) —
coalesced, the non-matching form yielding ''. Dates are RFC-1123
(weekday optional, 1- or 2-digit day, numeric ``+hhmm`` zones applied
as real offsets, alphabetic 3-letter zones assumed UTC) parsed to UTC
epoch; unparseable/missing dates surface as NULL, never drop the item.
Output is strings/BIGINT — the DuckDB oracle reconstructs items
closed-form (same discipline as the sitemap/webtable oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ITEM_RE = r"(?s)<(?:item|entry)>(.*?)</(?:item|entry)>"
_LINK_TEXT_RE = r"(?s)<link>(.*?)</link>"
_LINK_HREF_RE = r'<link href="([^"]*)"'
_TITLE_RE = r"(?s)<title>(.*?)</title>"
_DATE_RE = r"(?s)<(?:pubDate|updated)>(.*?)</(?:pubDate|updated)>"


def parse_feed(
    feeds: DataFrame, feed_col: str = "feed_url", xml_col: str = "xml"
) -> DataFrame:
    """(feed_url, xml) → (feed_url, item_idx, link, title,
    published_epoch BIGINT nullable)."""
    items = feeds.select(
        F.col(feed_col).alias("feed_url"),
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_ITEM_RE), F.lit(1))
        ).alias("pos", "item"),
    )
    link = F.when(
        F.regexp_extract("item", _LINK_TEXT_RE, 1) != "",
        F.regexp_extract("item", _LINK_TEXT_RE, 1),
    ).otherwise(F.regexp_extract("item", _LINK_HREF_RE, 1))
    raw_date = F.regexp_extract("item", _DATE_RE, 1)
    # RFC-1123 pubDate handling (ADVICE r5): strip the optional leading
    # weekday ("Fri, "), then try the NUMERIC-zone form first ('+0000',
    # '+0530', … — 'Z' applies the real offset, 'd' accepts 1- and
    # 2-digit days), falling back to an alphabetic zone (' GMT')
    # stripped-and-assumed-UTC, the pre-r6 behavior
    no_weekday = F.regexp_replace(raw_date, r"^[A-Za-z]{3}, ", "")
    no_alpha_zone = F.regexp_replace(no_weekday, r" [A-Z]{3}$", "")
    parsed = F.coalesce(
        F.try_to_timestamp(no_weekday, F.lit("d MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(no_alpha_zone, F.lit("d MMM yyyy HH:mm:ss")),
    )
    return items.select(
        "feed_url",
        (F.col("pos") + 1).cast("long").alias("item_idx"),
        link.alias("link"),
        F.regexp_extract("item", _TITLE_RE, 1).alias("title"),
        F.when(raw_date != "", parsed.cast("long")).alias("published_epoch"),
    ).filter(F.col("link") != "")
