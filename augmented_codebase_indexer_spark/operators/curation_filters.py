"""Corpus-level curation filters for LLM training data — the two standard
web-pipeline passes the per-document stats in ``textstats.py`` can't do:

* ``boilerplate_prune`` — cross-document segment dedup (the RefinedWeb /
  CCNet "line-level dedup" pass): a segment (sentence/line) appearing in
  ≥ ``min_df`` distinct documents is boilerplate (cookie banners,
  subscribe prompts, nav text) and is removed from EVERY document, with
  the per-doc removal count reported. This needs a global frequency pass,
  so it costs two shuffles — segment-frequency aggregation (map-side
  combined; a hot segment key combines before the exchange) and the
  per-document reassembly — plus one (small) join against the boilerplate
  set, which Catalyst broadcasts when it fits.

* ``repetition_stats`` — within-document duplicate n-gram fractions (the
  Gopher repetition rules): fraction of word 2-grams / 3-grams that are
  repeats. Pure per-row array algebra — zero shuffle, whole-stage codegen.

Both are UDF-free and exactly mirrored in DuckDB (fractions use
floor-truncation, not round(), so cross-engine float ties cannot flip the
last digit — see textstats.quality_score_col for the measured round() tie
hazard).

Reference anchor: the reference curates code by parser success, not corpus
statistics — these operators are part of the "operations a large-scale
training-data pipeline needs" mandate, patterned on public pipeline
designs (C4, Gopher, RefinedWeb).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEG_SEP = ". "


def boilerplate_prune(
    df: DataFrame,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_sep: str = SEG_SEP,
) -> DataFrame:
    """→ (doc_id, clean_text, n_kept, n_removed). Segments = ``seg_sep``
    splits — ``'. '`` (sentence-ish) for the synthetic corpus, ``'\\n'``
    for web-extracted text whose lines are the natural units. A doc whose
    every segment is boilerplate survives with ``clean_text = ''`` —
    dropping it is the caller's policy call."""
    segs = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.posexplode(F.split(F.col(text_col), re.escape(seg_sep))).alias("pos", "seg"))
    )
    freq = segs.groupBy("seg").agg(F.countDistinct("doc_id").alias("df"))
    kept = segs.join(freq.filter(F.col("df") < min_df).select("seg"), "seg")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
            seg_sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), re.escape(seg_sep))).cast("long").alias("__n_total"),
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("__n_total") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long").alias("n_removed"),
        )
    )


def boilerplate_oracle_sql(min_df: int = 3, table: str = "documents",
                           id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
    WITH base AS (
      SELECT {id_col} AS doc_id, string_split({text_col}, '. ') AS toks,
             len(string_split({text_col}, '. ')) AS n
      FROM {table}
    ),
    segs AS (
      SELECT doc_id, toks[CAST(i AS INT)] AS seg, CAST(i AS INT) AS pos
      FROM base, unnest(range(1, n + 1)) AS r(i)
    ),
    freq AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg),
    kept AS (SELECT s.doc_id, s.seg, s.pos FROM segs s JOIN freq f USING (seg)
             WHERE f.df < {min_df}),
    rebuilt AS (
      SELECT doc_id, string_agg(seg, '. ' ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT d.{id_col} AS doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(string_split(d.{text_col}, '. ')) - coalesce(r.n_kept, 0) AS BIGINT)
             AS n_removed
    FROM {table} d LEFT JOIN rebuilt r ON d.{id_col} = r.doc_id
    """


def segment_doc_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    seg_sep: str = SEG_SEP,
) -> DataFrame:
    """Per-segment document frequency of a doc batch: (seg, df). One
    aggregation; a doc contributes 1 per DISTINCT segment it contains."""
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(F.split(F.col(text_col), re.escape(seg_sep))).alias("seg"))
        .groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("df"))
    )


def update_segment_df(
    state: DataFrame | None,
    added: DataFrame | None = None,
    removed: DataFrame | None = None,
    seg_sep: str = SEG_SEP,
) -> DataFrame:
    """Incrementally maintain the corpus-global segment-frequency state:
    add the counts of new docs, subtract the counts of deleted docs, drop
    segments that reach df ≤ 0. The nightly boilerplate pass then prices
    only the BATCH, not the corpus — the state merge aggregates (seg,
    delta) rows, and the batch prune joins the (small) boilerplate subset
    of the state. Callers persist the returned state (a warehouse table in
    production — sources/catalog.py upserts fit it directly)."""
    parts = []
    if state is not None:
        parts.append(state.select("seg", F.col("df").cast("long").alias("df")))
    if added is not None:
        parts.append(segment_doc_counts(added, seg_sep=seg_sep))
    if removed is not None:
        parts.append(
            segment_doc_counts(removed, seg_sep=seg_sep).select("seg", (-F.col("df")).alias("df"))
        )
    if not parts:
        raise ValueError("update_segment_df needs at least one input")
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return (
        merged.groupBy("seg").agg(F.sum("df").cast("long").alias("df"))
        .filter(F.col("df") > 0)
    )


def crossed_segments(
    state_before: DataFrame | None, state_after: DataFrame, min_df: int = 3
) -> DataFrame:
    """Segments whose boilerplate verdict FLIPPED between two states:
    newly boilerplate (df climbed past min_df — docs cleaned earlier still
    carry it) or no-longer boilerplate (deletes dropped df below min_df —
    docs cleaned earlier lost a segment they should keep). This is the
    correctness core of incremental cleaning: without it, early batches
    silently keep banners that only later became frequent. The flipped
    set is tiny (segments near the threshold), so downstream re-clean
    discovery can broadcast it."""
    after = state_after.select("seg", F.col("df").alias("__df_a"))
    if state_before is None:
        return after.filter(F.col("__df_a") >= min_df).select("seg")
    before = state_before.select("seg", F.col("df").alias("__df_b"))
    j = before.join(after, "seg", "full_outer").select(
        "seg",
        F.coalesce("__df_b", F.lit(0)).alias("b"),
        F.coalesce("__df_a", F.lit(0)).alias("a"),
    )
    return j.filter(
        ((F.col("b") < min_df) & (F.col("a") >= min_df))
        | ((F.col("b") >= min_df) & (F.col("a") < min_df))
    ).select("seg")


def affected_doc_ids(
    docs: DataFrame,
    crossed: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_sep: str = SEG_SEP,
) -> DataFrame:
    """Ids of previously processed docs that contain a flipped segment and
    therefore need re-pruning with the new state. The crossed set
    broadcasts; the corpus-side explode is narrow into the broadcast
    semi-join, so discovery never shuffles document text."""
    segs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), re.escape(seg_sep))).alias("seg"),
    )
    return segs.join(F.broadcast(crossed), "seg", "left_semi").select("doc_id").distinct()


def boilerplate_prune_with_state(
    df: DataFrame,
    segment_df_state: DataFrame,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_sep: str = SEG_SEP,
) -> DataFrame:
    """``boilerplate_prune`` against a MAINTAINED global frequency state
    (which must already include this batch's docs): prune only the batch,
    using the boilerplate subset of the state — segments with df ≥ min_df,
    a set small enough to broadcast (only repeated segments qualify), so
    the batch pays one anti-join plus its own reassembly shuffle instead
    of a corpus-wide frequency pass. Identical output to running
    ``boilerplate_prune`` over the full corpus (pytest-gated)."""
    boiler = segment_df_state.filter(F.col("df") >= min_df).select("seg")
    segs = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), re.escape(seg_sep))).alias("pos", "seg"),
    )
    kept = segs.join(F.broadcast(boiler), "seg", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
            seg_sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), re.escape(seg_sep))).cast("long").alias("__n_total"),
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("__n_total") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long").alias("n_removed"),
        )
    )


def _dup_frac(grams: Column) -> Column:
    """1 − distinct/total, floor-truncated to 6 decimals (floor on an
    identical IEEE division is engine-stable; round() is not — see module
    docstring). 0.0 for docs too short to have any gram."""
    total = F.size(grams)
    frac = F.lit(1.0) - F.size(F.array_distinct(grams)) / total
    return F.when(total > 0, F.floor(frac * 1e6) / 1e6).otherwise(F.lit(0.0))


def dup_2gram_frac_col(text: Column) -> Column:
    """Duplicate word-2-gram fraction of a text column — reusable as a
    narrow filter predicate (no join against ``repetition_stats``)."""
    toks = F.split(text, " ")
    n = F.size(toks)
    len2 = F.greatest(n - 1, F.lit(0))  # slice() rejects negative lengths
    g2 = F.zip_with(
        F.slice(toks, 1, len2), F.slice(toks, 2, len2),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return _dup_frac(g2)


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_tokens, dup_2gram_frac, dup_3gram_frac). Gopher-style
    repetition signals; filter thresholds are the caller's policy."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    len3 = F.greatest(n - 2, F.lit(0))  # slice() rejects negative lengths
    g3 = F.zip_with(
        F.slice(toks, 1, len3),
        F.zip_with(F.slice(toks, 2, len3), F.slice(toks, 3, len3),
                   lambda b, c: F.concat(b, F.lit(" "), c)),
        lambda a, bc: F.concat(a, F.lit(" "), bc),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        dup_2gram_frac_col(F.col(text_col)).alias("dup_2gram_frac"),
        _dup_frac(g3).alias("dup_3gram_frac"),
    )


def repetition_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    return f"""
    WITH base AS (
      SELECT {id_col} AS doc_id, string_split({text_col}, ' ') AS toks,
             len(string_split({text_col}, ' ')) AS n
      FROM {table}
    ),
    grams AS (
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             [toks[i] || ' ' || toks[i+1] FOR i IN range(1, n)] AS g2,
             [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
              FOR i IN range(1, n - 1)] AS g3
      FROM base
    )
    SELECT doc_id, n_tokens,
           CASE WHEN len(g2) > 0
                THEN floor((1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)) * 1e6) / 1e6
                ELSE 0.0 END AS dup_2gram_frac,
           CASE WHEN len(g3) > 0
                THEN floor((1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)) * 1e6) / 1e6
                ELSE 0.0 END AS dup_3gram_frac
    FROM grams
    """
