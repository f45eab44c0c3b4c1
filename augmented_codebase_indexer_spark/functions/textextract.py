"""Boilerplate-stripping HTML → text extraction.

The per-row invariant (BASELINE.json input_hint) is that extracted text per
url is byte-identical between the distributed pipeline and a pure-Python
oracle. The only safe way to guarantee that is to have exactly ONE
implementation (this module) imported by both sides — the oracle calls
``extract_text`` directly; Spark wraps it in an Arrow-batched pandas UDF
(``extract_text_udf``). Never reimplement the extraction twice
(SURVEY.md §7.4 risk #1).

Reference analogs: single-file read guards (10 MB cap, decode failure skip —
``core/file_scanner/scanner.py:266-312``), binary NUL-byte skip
(``infrastructure/grep_searcher.py:213-228``), docstring/boilerplate
normalization (``core/docstring_formatter.py:15-274``).
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

MAX_HTML_BYTES = 10 * 1024 * 1024  # scanner.py:283 analog

# Boilerplate containers removed wholesale (trafilatura-style main-content bias).
_BOILERPLATE_RE = re.compile(
    r"<(script|style|nav|header|footer|aside|noscript)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
# Block-level tags become line breaks so paragraph structure survives.
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|section|article|blockquote|pre)\b[^>]*/?>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_INTRALINE_WS_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html_bytes: bytes | bytearray | memoryview | None) -> str | None:
    """Pure function: html bytes → extracted text, or None for skipped rows.

    Skip rules (return None, mirroring the reference's scanner guards):
      * null input
      * larger than MAX_HTML_BYTES
      * contains NUL bytes (binary junk)
      * not valid UTF-8
    """
    if html_bytes is None:
        return None
    b = bytes(html_bytes)
    if len(b) > MAX_HTML_BYTES:
        return None
    if b"\x00" in b:
        return None
    try:
        raw = b.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return None

    s = _COMMENT_RE.sub(" ", raw)
    s = _BOILERPLATE_RE.sub(" ", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)

    lines = []
    for line in s.split("\n"):
        line = _INTRALINE_WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def _extract_series(html: pd.Series) -> pd.Series:
    # Arrow hands binary columns over as bytes/bytearray/None per element;
    # the loop is over an in-memory Arrow batch, not a per-row Python UDF
    # crossing (one serialization round-trip per ~10k-row batch).
    return html.map(extract_text)


extract_text_udf = F.pandas_udf(_extract_series, StringType())


def outlink_edges(pages, url_col: str = "url", html_col: str = "html"):
    """(src_url, href) edge extraction from raw html anchors (C8 — the
    ``core/chunker/import_extractors.py:12-103`` analog: the reference
    extracts import edges per file; a web corpus KG extracts the link
    graph, which is also the natural PageRank input).

    Runs BEFORE boilerplate stripping — nav/anchor links are exactly what
    the extractor deletes from text but what the link graph needs. Pure JVM
    expressions (decode + regexp_extract_all + explode): a narrow per-row
    flatMap, no Python, no shuffle; SQL-mirrorable."""
    html_str = F.decode(F.col(html_col), "UTF-8")
    hrefs = F.regexp_extract_all(html_str, F.lit('<a href="([^"]+)"'), 1)
    return pages.select(
        F.col(url_col).alias("src_url"), F.explode(hrefs).alias("href")
    )


def with_extracted_text(df, html_col: str = "html", out_col: str = "extracted_text"):
    """pages(url, warc_ts, html, text, lang) → + extracted_text column.

    Rows that fail the skip rules get NULL and should be filtered by the
    caller (``.filter(F.col(out_col).isNotNull())``) — the same null-then-
    filter pattern the reference uses for undecodable files.
    """
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
