"""Spark stages: text extraction, mention detection, triple extraction.

All three are Arrow-batched ``mapInPandas`` stages (1 input row → N output
rows, UDTF-shaped — the reference's ``process_file_worker`` pattern,
``services/indexing_worker.py:45-129``). The gazetteer ships to executors
once as a Spark broadcast variable; the compiled alias automaton is built
lazily per Python worker and cached in a module global keyed by the
broadcast id — the reference's init-once worker pattern
(``services/indexing_worker.py:24-42``) mapped onto Spark's executor model.

No per-row Python UDFs anywhere: every crossing is an Arrow batch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.openie import (
    build_matcher,
    extract_triples_from_text,
    find_mentions,
    line_of,
)
from ..functions.textextract import extract_text

class BcHandle(NamedTuple):
    """A Broadcast plus a content-derived cache token (Broadcast objects
    lose identity across task deserialization, so the per-worker init-once
    cache keys on the token instead)."""

    bc: object
    token: str


# per-worker matcher cache: content token → compiled regex (init-once analog)
_MATCHER_CACHE: dict[str, object] = {}


def _matcher_from(handle: BcHandle | None) -> object:
    """Init-once per python worker: alternation regex for small alias sets,
    Aho-Corasick automaton past ``openie.AC_THRESHOLD`` (identical spans;
    the automaton's scan cost is independent of gazetteer size)."""
    if handle is None:
        return None
    if handle.token not in _MATCHER_CACHE:
        _MATCHER_CACHE[handle.token] = build_matcher(handle.bc.value)
    return _MATCHER_CACHE[handle.token]


def broadcast_aliases(spark: SparkSession, aliases: list[str]) -> BcHandle:
    """Ship the gazetteer surface forms once per executor."""
    vals = sorted(set(aliases))
    token = "aliases-" + hashlib.md5("\n".join(vals).encode()).hexdigest()[:16]
    return BcHandle(spark.sparkContext.broadcast(vals), token)


# ---------------------------------------------------------------------------
# stage: extract  (pages → url, warc_ts, lang, extracted_text)
# ---------------------------------------------------------------------------

EXTRACT_SCHEMA = "url string, warc_ts timestamp, lang string, extracted_text string"


def extract_stage(pages: DataFrame) -> DataFrame:
    """html → extracted text; skip rows (oversized / NUL / bad UTF-8) get
    NULL and are filtered. Drops the fat ``html`` column immediately after
    extraction so downstream shuffles never carry it (column-pruning
    discipline — SURVEY.md §4)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "lang": pdf["lang"],
                    "extracted_text": pdf["html"].map(extract_text),
                }
            )
            yield out

    cols = pages.select("url", "warc_ts", "lang", "html")
    return cols.mapInPandas(fn, EXTRACT_SCHEMA).filter(
        F.col("extracted_text").isNotNull()
    )


# ---------------------------------------------------------------------------
# stage: mentions  (extracted → url, surface, start, end, kind)
# ---------------------------------------------------------------------------

MENTION_SCHEMA = "url string, surface string, start int, end int, kind string"


def mention_stage(extracted: DataFrame, alias_bc) -> DataFrame:
    """Mention rows (parser-strategy analog ``python_parser.py:23-123``)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = _matcher_from(alias_bc)
        for pdf in batches:
            rows = []
            for url, text in zip(pdf["url"], pdf["extracted_text"]):
                if not text:
                    continue
                for m in find_mentions(text, matcher):
                    rows.append((url, m.surface, m.start, m.end, m.kind))
            yield pd.DataFrame(rows, columns=["url", "surface", "start", "end", "kind"])

    return extracted.select("url", "extracted_text").mapInPandas(fn, MENTION_SCHEMA)


# ---------------------------------------------------------------------------
# stage: candidate triples
# ---------------------------------------------------------------------------

TRIPLE_SCHEMA = (
    "url string, pos int, pred string, subj_surface string, obj_surface string, "
    "context string"
)


def triple_stage(extracted: DataFrame, alias_bc) -> DataFrame:
    """Pattern-OpenIE candidate triples with provenance (url, pos) and the
    containing line as linking context (reference-extractor analog,
    ``python_reference_extractor.py:18-114``)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = _matcher_from(alias_bc)
        for pdf in batches:
            rows = []
            for url, text in zip(pdf["url"], pdf["extracted_text"]):
                if not text:
                    continue
                for t in extract_triples_from_text(text, matcher):
                    rows.append(
                        (url, t.pos, t.pred, t.subj_surface, t.obj_surface,
                         line_of(text, t.pos))
                    )
            yield pd.DataFrame(
                rows,
                columns=["url", "pos", "pred", "subj_surface", "obj_surface", "context"],
            )

    return extracted.select("url", "extracted_text").mapInPandas(fn, TRIPLE_SCHEMA)
