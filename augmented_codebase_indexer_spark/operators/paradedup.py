"""Paragraph-level exact deduplication — the RefinedWeb/CCNet line-dedup
pass (Penedo et al., RefinedWeb 2023 §"line-wise corrections"; Wenzek et
al., CCNet 2020 §4.1 paragraph dedup): repeated paragraphs (navigation
chrome, cookie banners, syndicated boilerplate) are removed EVERYWHERE
except their first occurrence, and each document is re-assembled from
its surviving paragraphs in original order.

Document-level dedup (``operators/dedup.py``) drops whole pages; this
operator is its sub-document complement — the highest-yield cleanup on
real web text, where the same footer appears on millions of pages that
are otherwise unique. The reference dedups whole artifacts by content
hash (`src/aci/services/indexing_service.py:160-177`); paragraph
granularity is the web-corpus generalization.

Scale shape (the 100-TB contract):

* The global first-occurrence vote runs over ``md5(para)`` — a 32-byte
  key — as ONE map-side-combinable groupBy: ``min(struct(doc_id, pidx))``
  per hash. Paragraph text never rides that exchange.
* Winners come back as a slim (h, w_doc, w_pidx) frame; the keep-join is
  hash-keyed, AQE-skew-splittable (the one hot key a 10^9-times-repeated
  cookie banner creates is exactly what AQE skew-join splits).
* Reassembly is a per-doc collect_list bounded by document size.

Determinism: first occurrence = lexicographic min (doc_id, pidx); docs
whose every paragraph was dropped (or that had no paragraphs) surface
with ``text = ''`` — both engines coalesce, sidestepping the DuckDB
``string_agg``-over-nothing NULL divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_paragraphs(
    docs: DataFrame,
    sep_regex: str = r"\n{2,}",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, pidx, para): split on ``sep_regex``, trim, drop empties.
    ``pidx`` is the ORIGINAL split position so reassembly order is stable
    even after blanks drop out."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.split(F.col(text_col), sep_regex)
            ).alias("pidx", "para"),
        )
        .withColumn("para", F.trim(F.col("para")))
        .filter(F.col("para") != "")
        .select("doc_id", F.col("pidx").cast("long").alias("pidx"), "para")
    )


def paragraph_dedup(paras: DataFrame, sep: str = "\n") -> DataFrame:
    """→ (doc_id, n_paras, n_kept, text): corpus-wide exact paragraph
    dedup keeping only the first occurrence (min (doc_id, pidx)) of each
    distinct paragraph; ``text`` is the doc re-joined from its surviving
    paragraphs with ``sep``. Input: (doc_id, pidx, para), para non-empty,
    pidx unique per doc."""
    withh = paras.withColumn("h", F.md5(F.col("para")))
    winners = (
        withh.groupBy("h")
        .agg(F.min(F.struct("doc_id", "pidx")).alias("w"))
        .select(
            "h",
            F.col("w.doc_id").alias("w_doc"),
            F.col("w.pidx").alias("w_pidx"),
        )
    )
    kept = (
        withh.join(winners, "h")
        .filter(
            (F.col("doc_id") == F.col("w_doc"))
            & (F.col("pidx") == F.col("w_pidx"))
        )
        .select("doc_id", "pidx", "para")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pidx", "para"))),
                lambda x: x["para"],
            ),
            sep,
        ).alias("text"),
    )
    totals = paras.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paras")
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_paras",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
        )
    )


def paragraph_dedup_oracle_sql(
    paras_sql: str, sep: str = "\n"
) -> str:
    """DuckDB mirror: same first-occurrence rule, same reassembly order,
    same ''-for-empty coalesce. ``paras_sql`` must yield
    (doc_id, pidx, para) with para non-empty."""
    sep_lit = sep.replace("'", "''").replace(chr(10), "' || chr(10) || '")
    return f"""
    WITH p AS MATERIALIZED ({paras_sql}),
    ranked AS (
      SELECT doc_id, pidx, para,
             row_number() OVER (
               PARTITION BY md5(para) ORDER BY doc_id, pidx) AS rn
      FROM p),
    kept AS (SELECT doc_id, pidx, para FROM ranked WHERE rn = 1),
    rebuilt AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(para, '{sep_lit}' ORDER BY pidx) AS text
      FROM kept GROUP BY doc_id),
    totals AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras FROM p
      GROUP BY doc_id)
    SELECT t.doc_id, t.n_paras,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(r.text, '') AS text
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    """


def paragraph_dedup_py(
    paras: list[tuple[int, int, str]], sep: str = "\n"
) -> list[tuple[int, int, int, str]]:
    """Pure-python mirror for tests: [(doc_id, n_paras, n_kept, text)]."""
    first: dict[str, tuple[int, int]] = {}
    for doc, pidx, para in sorted(paras):
        first.setdefault(para, (doc, pidx))
    out: dict[int, list[tuple[int, str]]] = {}
    totals: dict[int, int] = {}
    for doc, pidx, para in paras:
        totals[doc] = totals.get(doc, 0) + 1
        if first[para] == (doc, pidx):
            out.setdefault(doc, []).append((pidx, para))
    return [
        (
            doc,
            totals[doc],
            len(out.get(doc, [])),
            sep.join(p for _, p in sorted(out.get(doc, []))),
        )
        for doc in sorted(totals)
    ]


def paragraph_dedup_increment(
    paras_batch: DataFrame, seen: DataFrame | None, sep: str = "\n"
) -> tuple[DataFrame, DataFrame]:
    """Incremental form for crawl batches: dedup ``paras_batch`` first
    WITHIN the batch (the batch-local first-occurrence rule) and then
    against ``seen`` — the persisted winners relation (h) from all prior
    batches — returning (deduped docs, the NEW hashes to append to
    ``seen``). Processing a corpus in arrival-ordered batches yields
    EXACTLY the one-shot output (asserted in tests): first occurrence is
    first occurrence no matter where the batch boundary falls.

    ``seen`` is the slim distinct-paragraph hash relation — written once,
    bucketed by hash (`sources/catalog.py` discipline), so each nightly
    batch costs one within-batch vote plus one LEFT-ANTI join against a
    bucket-pruned table, never a rescan of the historical corpus."""
    withh = paras_batch.withColumn("h", F.md5(F.col("para")))
    winners = (
        withh.groupBy("h")
        .agg(F.min(F.struct("doc_id", "pidx")).alias("w"))
        .select(
            "h",
            F.col("w.doc_id").alias("w_doc"),
            F.col("w.pidx").alias("w_pidx"),
        )
    )
    kept = (
        withh.join(winners, "h")
        .filter(
            (F.col("doc_id") == F.col("w_doc"))
            & (F.col("pidx") == F.col("w_pidx"))
        )
        .select("doc_id", "pidx", "para", "h")
    )
    if seen is not None:
        kept = kept.join(seen.select("h"), "h", "left_anti")
    new_hashes = kept.select("h").distinct()
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pidx", "para"))),
                lambda x: x["para"],
            ),
            sep,
        ).alias("text"),
    )
    totals = paras_batch.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paras")
    )
    out = totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_paras",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    return out, new_hashes
