"""Entity linking: broadcast MinHash-LSH candidate index + Arrow-batched scorer.

Replaces the reference's Qdrant ANN store (north_star): the gazetteer —
small relative to the page corpus by definition — is shipped to every
executor as ONE broadcast variable; per Python worker we build (init-once,
``indexing_worker.py:24-42`` analog) the two lookup structures of the
3-tier resolution (``graph_builder.py:272-297``):

  tier 1  exact normalized-alias index (dict ≈ broadcast hash join),
  tier 2  ambiguity tie-break by hash-embedding cosine vs mention context,
  tier 3  MinHash-LSH banded candidate index + shingle-Jaccard scorer.

The whole linking stage is a single ``mapInPandas`` over the candidate-
triple DataFrame: ZERO shuffle. At 100 TB the alternative (unpivot +
3 shuffling joins + 2 windows over (url,pos)) moves the entire triple set
through the exchange three times; the broadcast design moves only the
gazetteer once per executor. Decision logic is the SHARED
``corpus.oracle.link_surface`` — identical results to the oracle by
construction.

For very large gazetteers (≫ executor memory) the same stage degrades
gracefully to the DataFrame LSH band-key join implemented in
``operators/simjoin.py`` — same band keys, same scorer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

import hashlib

from ..corpus.oracle import build_link_indexes, link_surface
from .extraction import BcHandle

_INDEX_CACHE: dict[str, tuple] = {}


def broadcast_gazetteer(spark: SparkSession, gazetteer_rows: list[dict]) -> BcHandle:
    """Broadcast the raw gazetteer rows (alias, ent_id, canonical_name,
    entity_type); index construction happens lazily on executors so the
    broadcast payload stays small."""
    keep = sorted(
        (
            {k: r[k] for k in ("alias", "ent_id", "canonical_name", "entity_type")}
            for r in gazetteer_rows
        ),
        key=lambda r: (r["ent_id"], r["alias"]),
    )
    token = "gaz-" + hashlib.md5(
        "\n".join(f"{r['ent_id']}|{r['alias']}" for r in keep).encode()
    ).hexdigest()[:16]
    return BcHandle(spark.sparkContext.broadcast(keep), token)


def _indexes_from(handle: BcHandle) -> tuple:
    if handle.token not in _INDEX_CACHE:
        _INDEX_CACHE[handle.token] = build_link_indexes(handle.bc.value)
    return _INDEX_CACHE[handle.token]


LINKED_SCHEMA = (
    "url string, pos int, pred string, subj_id string, obj_id string, "
    "subj_surface string, obj_surface string, resolved boolean"
)


def linking_stage(triples: DataFrame, gaz_bc) -> DataFrame:
    """candidate triples (url, pos, pred, subj_surface, obj_surface, context)
    → linked triples with ent_ids; unresolved rows flagged (F10 analog,
    ``graph_builder.py:299-314``) rather than dropped."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        exact_index, band_index = _indexes_from(gaz_bc)
        # per-batch memo: surfaces repeat heavily (hot entities) — score once
        memo: dict[tuple[str, str], str | None] = {}

        def link(surface: str, context: str):
            key = (surface, context)
            if key not in memo:
                memo[key] = link_surface(surface, context, exact_index, band_index)
            return memo[key]

        for pdf in batches:
            subj = [link(s, c) for s, c in zip(pdf["subj_surface"], pdf["context"])]
            obj = [link(o, c) for o, c in zip(pdf["obj_surface"], pdf["context"])]
            out = pd.DataFrame(
                {
                    "url": pdf["url"],
                    "pos": pdf["pos"],
                    "pred": pdf["pred"],
                    "subj_id": subj,
                    "obj_id": obj,
                    "subj_surface": pdf["subj_surface"],
                    "obj_surface": pdf["obj_surface"],
                }
            )
            out["resolved"] = out["subj_id"].notna() & out["obj_id"].notna()
            yield out

    return triples.mapInPandas(fn, LINKED_SCHEMA)


def fused_kg_stage(pages: DataFrame, alias_handle, gaz_handle) -> DataFrame:
    """extract → mention/OpenIE → link in ONE mapInPandas pass.

    The staged pipeline (extract_stage → triple_stage → linking_stage) keeps
    per-stage lineage and checkpoints, but each stage boundary costs a full
    JVM↔Python Arrow round-trip and its own python worker per task slot
    (3 workers/slot). For pure throughput — and for the scaling benchmark —
    fusing removes 2/3 of the serialization and worker pressure while
    producing byte-identical output (asserted in tests). Same trade
    Catalyst's whole-stage codegen makes for JVM operators.
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.openie import extract_triples_from_text, line_of
    from ..functions.textextract import extract_text
    from .extraction import _matcher_from

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = _matcher_from(alias_handle)
        exact_index, band_index = _indexes_from(gaz_handle)
        memo: dict[tuple[str, str], str | None] = {}

        def link(surface: str, context: str):
            key = (surface, context)
            if key not in memo:
                memo[key] = link_surface(surface, context, exact_index, band_index)
            return memo[key]

        for pdf in batches:
            rows = []
            for url, lang, html in zip(pdf["url"], pdf["lang"], pdf["html"]):
                if lang != "en":
                    continue
                text = extract_text(html)
                if not text:
                    continue
                for t in extract_triples_from_text(text, matcher):
                    ctx = line_of(text, t.pos)
                    sid = link(t.subj_surface, ctx)
                    oid = link(t.obj_surface, ctx)
                    rows.append(
                        (url, t.pos, t.pred, sid, oid, t.subj_surface, t.obj_surface,
                         sid is not None and oid is not None)
                    )
            yield pd.DataFrame(
                rows,
                columns=["url", "pos", "pred", "subj_id", "obj_id",
                         "subj_surface", "obj_surface", "resolved"],
            )

    return pages.select("url", "lang", "html").mapInPandas(fn, LINKED_SCHEMA)
