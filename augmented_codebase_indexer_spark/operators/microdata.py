"""Schema.org microdata extraction (flat-scope tier) + Open Graph meta
— the two attribute-based structured-markup formats next to JSON-LD.

Microdata (WHATWG HTML microdata; schema.org's second syntax) marks
items inline: ``<div itemscope itemtype="...Person"> <meta
itemprop="name" content="Ada">``. The FLAT tier implemented here
handles non-nested scopes — the dominant publisher pattern — exactly:
splitting the page on ``itemscope`` yields one segment per item whose
text runs to the next item's start, so the segment's itemtype and
every ``itemprop=... content=...`` pair inside it bind to that item
by construction (ordinal = segment position). Nested scopes would
need a parser stack; they are OUT of this tier, documented, and their
props attribute to the nearest preceding scope — the standard flat
approximation. Props carried as element text (no ``content``
attribute) are likewise out of the attribute tier.

Open Graph (ogp.me) is flat by definition: ``<meta property="og:..."
content="...">`` pairs at page level.

Both extractors are escape-free-regex + split/explode codegen scans —
no UDF, no shuffle; html never leaves the scan.

Reference anchor: the reference's structured extractors
(`operators/structured.py` here; reference `core/extractors`) read
publisher-declared metadata first — these complete the three-syntax
coverage (JSON-LD + microdata + OG).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PROP_PAT = 'itemprop="([^"]+)" content="([^"]+)"'


def microdata_items(
    pages: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """pages(id, html) → (id, item_idx, item_type, prop, value): one
    row per itemprop bound to its flat itemscope; item_idx is the
    item's ordinal on the page (1-based); scopes with an itemtype but
    no content-attr props are absent (prop-less items carry nothing
    this tier can assert)."""
    segs = pages.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(html_col), "itemscope")).alias(
            "item_idx", "seg"),
    ).filter(F.col("item_idx") > 0)
    typed = segs.select(
        id_col, "item_idx",
        F.regexp_extract("seg", 'itemtype="([^"]+)"', 1).alias("item_type"),
        F.expr(
            f"zip_with(regexp_extract_all(seg, '{_PROP_PAT}', 1), "
            f"regexp_extract_all(seg, '{_PROP_PAT}', 2), "
            "(p, v) -> struct(p AS prop, v AS value))"
        ).alias("pv"),
    )
    return (
        typed.select(
            id_col, "item_idx", "item_type",
            F.explode("pv").alias("m"),
        )
        .select(id_col, F.col("item_idx").cast("long").alias("item_idx"),
                "item_type", "m.prop", "m.value")
    )


def og_meta(
    pages: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """pages(id, html) → (id, og_prop, content): Open Graph pairs;
    og_prop carries the namespace-stripped name ('title', 'type',
    'image')."""
    pat = 'property="og:([a-z:]+)" content="([^"]*)"'
    z = F.expr(
        f"zip_with(regexp_extract_all({html_col}, '{pat}', 1), "
        f"regexp_extract_all({html_col}, '{pat}', 2), "
        "(p, v) -> struct(p AS og_prop, v AS content))"
    )
    return (
        pages.select(F.col(id_col), F.explode(z).alias("m"))
        .select(id_col, "m.og_prop", "m.content")
    )
