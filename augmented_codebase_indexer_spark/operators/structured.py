"""Structured-markup extraction — schema.org JSON-LD blocks from html.

Alongside free-text OpenIE, the web's HIGHEST-precision KG source is
the markup publishers embed themselves: ``<script type="application/
ld+json">`` blocks carrying schema.org entities (the Google/Bing/Yandex
rich-results contract; JSON-LD 1.1 is a W3C recommendation). Public
web-KG builds (e.g. WebDataCommons) mine exactly these. The reference's
analog is docstring/signature extraction — structure the author wrote,
not structure inferred.

Two stages, all JVM builtins:

* :func:`extract_jsonld` — one codegen scan: regex out every JSON-LD
  script block (DOTALL, non-greedy), explode to (url, block_idx, raw).
  The html payload dies inside the scan; only the (small) JSON blocks
  move downstream.
* :func:`jsonld_items` — pull ``@type`` / ``name`` / ``url`` via JSON
  path expressions. Malformed JSON yields NULL columns — surfaced, not
  dropped (the caller decides; the repo's no-silent policy). Subset
  documented: one top-level object per block (`@graph` arrays and
  nested entities pass through with NULL fields, countable by the
  caller).

DuckDB mirrors use ``json_valid`` + ``->>`` paths, so the oracle is
exact on both well-formed and malformed blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLOCK_RE = r'(?s)<script type="application/ld\+json">(.*?)</script>'


def extract_jsonld(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages → (url, block_idx, raw): one row per JSON-LD block, in
    document order (block_idx is 1-based)."""
    html_str = F.decode(F.col(html_col), "UTF-8")
    return pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(html_str, F.lit(_BLOCK_RE), F.lit(1))
        ).alias("pos", "raw"),
    ).select("url", (F.col("pos") + 1).cast("long").alias("block_idx"), "raw")


def jsonld_items(blocks: DataFrame) -> DataFrame:
    """(url, block_idx, raw) → + (item_type, name, item_url); NULL where
    the block is malformed or the field is absent."""
    return blocks.select(
        "url",
        "block_idx",
        F.get_json_object("raw", "$['@type']").alias("item_type"),
        F.get_json_object("raw", "$['name']").alias("name"),
        F.get_json_object("raw", "$['url']").alias("item_url"),
    )


def jsonld_items_sql(pages_sql: str) -> str:
    """DuckDB mirror over a closed-form (url, raw) relation of already-
    extracted blocks (DuckDB's regex engine lacks lazy quantifiers in
    list form, so oracles reconstruct blocks closed-form; block_idx
    must be provided by the relation)."""
    def _field(name: str) -> str:
        return (
            f"CASE WHEN json_valid(raw) THEN raw ->> '$.\"{name}\"' "
            f"ELSE NULL END AS "
        )

    return f"""
    WITH b AS ({pages_sql})
    SELECT url, CAST(block_idx AS BIGINT) AS block_idx,
           {_field('@type')} item_type,
           {_field('name')} name,
           {_field('url')} item_url
    FROM b
    """
