"""Continuous curation — the hygiene chain as a stream, converging to the
batch result no matter how documents arrive.

Each micro-batch maintains three warehouse tables and reconciles exactly
what the batch pipeline (``plans/curation.py::curation_pipeline_v2``)
would have produced over everything seen so far:

* ``segment_df`` — corpus-global segment document-frequency
  (``update_segment_df``: one (seg, delta) aggregation per batch).
* ``doc_hash`` — one slim row (doc_id, sha, quality) per doc currently
  passing the per-doc filters; the exact-dedup winner for a hash is
  min(doc_id) over this table, so late-arriving smaller ids PROMOTE
  (the stream is arrival-order independent).
* ``cur_chunks`` — curated chunk rows for winner docs only, upserted by
  content hash.

The correctness core is re-cleaning: when a batch pushes a segment's df
across min_df (``crossed_segments``), docs cleaned earlier carry a stale
verdict — ``affected_doc_ids`` finds them (broadcast semi-join, no text
shuffle) and they re-enter the batch. Their sha may change, their
eligibility may change, and a dedup runner-up may be promoted; all three
are reconciled per touched hash.

Scale notes: per-trigger work is O(batch + affected + touched-hash
docs), never O(corpus). ``segment_df``/``doc_hash`` rewrites here are
whole-table (sandbox parquet); production keys them through
``upsert_buckets`` like ``cur_chunks`` already is. Deletes flow through
``update_segment_df(removed=...)`` + the same reconcile; the stream path
is insert-only (file sources don't retract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.chunking import chunk_documents
from ..operators.curation_filters import (
    affected_doc_ids,
    boilerplate_prune_with_state,
    crossed_segments,
    dup_2gram_frac_col,
    update_segment_df,
)
from ..operators.textstats import lang_id_col, quality_score_col
from ..sources.catalog import Warehouse

DOCS_SCHEMA = "doc_id long, text string"


def _eligible(cleaned: DataFrame, min_quality: float, allowed_langs: tuple,
              max_dup_2gram: float) -> DataFrame:
    """Per-doc filters on cleaned text → (doc_id, text, sha, quality)."""
    t = F.col("text")
    return (
        cleaned.filter(F.length(t) > 0)
        .filter(dup_2gram_frac_col(t) <= max_dup_2gram)
        .withColumn("quality", quality_score_col(t))
        .withColumn("lang_pred", lang_id_col(t))
        .filter((F.col("quality") >= min_quality)
                & F.col("lang_pred").isin(*allowed_langs))
        .select("doc_id", "text", F.sha2(t, 256).alias("sha"), "quality")
    )


def curate_increment(
    wh: Warehouse,
    batch_df: DataFrame,
    min_df: int = 3,
    min_quality: float = 0.3,
    allowed_langs: tuple = ("en",),
    max_dup_2gram: float = 0.3,
    size: int = 40,
    overlap: int = 10,
    n_buckets: int = 8,
) -> dict:
    """Process one batch of (doc_id, text) rows; returns reconcile counters."""
    spark = batch_df.sparkSession
    batch_df = batch_df.dropDuplicates(["doc_id"]).persist()

    # 1. frequency state forward
    state1 = wh.read(spark, "segment_df") if wh.exists("segment_df") else None
    state2 = update_segment_df(state1, added=batch_df).persist()
    state2.count()  # pin before the old table is rewritten underneath it

    # 2. stale docs from verdict flips (old corpus only)
    raw_old = wh.read(spark, "docs_raw") if wh.exists("docs_raw") else None
    if raw_old is not None and state1 is not None:
        crossed = crossed_segments(state1, state2, min_df)
        redo_ids = affected_doc_ids(raw_old, crossed)
        redo = raw_old.join(F.broadcast(redo_ids), "doc_id", "left_semi")
    else:
        redo = None
    to_process = (
        batch_df if redo is None
        else batch_df.unionByName(redo.select("doc_id", "text"))
    ).persist()

    # 3. clean + per-doc filters for every touched doc
    cleaned = boilerplate_prune_with_state(to_process, state2, min_df=min_df)
    eligible = _eligible(
        cleaned.select("doc_id", F.col("clean_text").alias("text")),
        min_quality, allowed_langs, max_dup_2gram,
    ).persist()

    # 4. doc_hash reconcile: drop every touched id, re-add the now-eligible
    touched_ids = to_process.select("doc_id").distinct()
    old_hash = wh.read(spark, "doc_hash") if wh.exists("doc_hash") else None
    removed_rows = (
        old_hash.join(F.broadcast(touched_ids), "doc_id", "left_semi")
        if old_hash is not None else None
    )
    new_hash = eligible.select("doc_id", "sha", "quality")
    doc_hash = (
        new_hash if old_hash is None
        else old_hash.join(F.broadcast(touched_ids), "doc_id", "left_anti")
        .unionByName(new_hash)
    ).persist()
    doc_hash.count()  # pin before rewriting the table it reads

    # 5. winners for every touched hash (old row removed OR new row added —
    #    covers demotion, promotion, and text changes)
    touched_shas = new_hash.select("sha")
    if removed_rows is not None:
        touched_shas = touched_shas.unionByName(removed_rows.select("sha"))
    touched_shas = touched_shas.distinct()
    winners = (
        doc_hash.join(F.broadcast(touched_shas), "sha", "left_semi")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("sha").orderBy(F.asc("doc_id"))),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "sha", "quality")
        .persist()
    )

    # 6. chunks for those winners. Winner text comes from eligible (touched
    #    docs) or docs_raw re-cleaned with state2 — for an untouched doc no
    #    segment verdict changed, so re-cleaning reproduces its text.
    need_text = winners.join(F.broadcast(
        eligible.select("doc_id")), "doc_id", "left_anti").select("doc_id")
    extra_text = None
    if raw_old is not None:
        extra = raw_old.join(F.broadcast(need_text), "doc_id", "left_semi")
        extra_text = boilerplate_prune_with_state(extra, state2, min_df=min_df)\
            .select("doc_id", F.col("clean_text").alias("text"))
    texts = eligible.select("doc_id", "text")
    if extra_text is not None:
        texts = texts.unionByName(extra_text)
    win_docs = winners.join(texts, "doc_id").select("doc_id", "sha", "quality", "text")
    chunks = (
        chunk_documents(win_docs.select("doc_id", "text"), size=size, overlap=overlap)
        .join(win_docs.select("doc_id", "sha", F.round("quality", 6).alias("quality")),
              "doc_id")
        .select("doc_id", "chunk_id", "part_index", "total_parts", "n_tokens",
                "quality", "sha")
    )

    # 7. counters BEFORE any table rewrite (they read the old tables),
    #    then commit: chunk upsert keyed by touched hash; state rewritten
    counters = {
        "batch_docs": batch_df.count(),
        "recleaned_docs": 0 if redo is None else redo.count(),
        "touched_hashes": touched_shas.count(),
    }
    raw_new = batch_df if raw_old is None else (
        raw_old.join(F.broadcast(batch_df.select("doc_id")), "doc_id", "left_anti")
        .unionByName(batch_df)
    )
    raw_new = raw_new.persist()
    raw_new.count()  # materialize every old-table read before the swaps
    stats = wh.upsert_buckets(
        spark, "cur_chunks", chunks, touched_shas, delete_col="sha",
        bucket_col="doc_id", n_buckets=n_buckets,
    )
    wh.commit(state2, "segment_df")
    wh.commit(doc_hash, "doc_hash")
    wh.commit(raw_new, "docs_raw")
    counters.update({k: v for k, v in stats.items() if isinstance(v, (int, float))})
    wh.record_metrics(spark, "curation_stream", counters)
    for df in (batch_df, state2, to_process, eligible, doc_hash, winners, raw_new):
        df.unpersist()
    return counters


def retract_docs(
    wh: Warehouse,
    doc_ids: DataFrame,
    min_df: int = 3,
    min_quality: float = 0.3,
    allowed_langs: tuple = ("en",),
    max_dup_2gram: float = 0.3,
    size: int = 40,
    overlap: int = 10,
    n_buckets: int = 8,
) -> dict:
    """Delete documents from the curated corpus (takedowns, robots.txt
    revocations, licence changes) and converge to what a fresh batch run
    over the remaining docs would produce:

    * segment frequencies DECREMENT (``update_segment_df(removed=...)``) —
      a segment may drop below min_df and stop being boilerplate, so docs
      that lost it earlier re-clean and GROW text back
      (``crossed_segments``' other branch);
    * a removed dedup winner hands its slot to the smallest surviving id
      with the same hash (the same touched-hash reconcile as inserts);
    * the retracted ids leave ``docs_raw``/``doc_hash``/``cur_chunks``.

    Work is O(retracted + affected + touched-hash docs), never O(corpus)."""
    spark = doc_ids.sparkSession
    ids = doc_ids.select("doc_id").distinct().persist()
    raw_old = wh.read(spark, "docs_raw")
    gone = raw_old.join(F.broadcast(ids), "doc_id", "left_semi").persist()

    state1 = wh.read(spark, "segment_df")
    state2 = update_segment_df(state1, removed=gone).persist()
    state2.count()

    remaining = raw_old.join(F.broadcast(ids), "doc_id", "left_anti")
    crossed = crossed_segments(state1, state2, min_df)
    redo = remaining.join(
        F.broadcast(affected_doc_ids(remaining, crossed)), "doc_id", "left_semi"
    ).persist()

    cleaned = boilerplate_prune_with_state(redo, state2, min_df=min_df)
    eligible = _eligible(
        cleaned.select("doc_id", F.col("clean_text").alias("text")),
        min_quality, allowed_langs, max_dup_2gram,
    ).persist()

    # doc_hash reconcile: retracted ids and re-cleaned ids leave, the
    # re-cleaned re-enter if still eligible
    touched_ids = ids.unionByName(redo.select("doc_id")).distinct()
    old_hash = wh.read(spark, "doc_hash")
    removed_rows = old_hash.join(F.broadcast(touched_ids), "doc_id", "left_semi")
    new_hash = eligible.select("doc_id", "sha", "quality")
    doc_hash = (
        old_hash.join(F.broadcast(touched_ids), "doc_id", "left_anti")
        .unionByName(new_hash).persist()
    )
    doc_hash.count()

    touched_shas = (
        new_hash.select("sha").unionByName(removed_rows.select("sha")).distinct()
    )
    winners = (
        doc_hash.join(F.broadcast(touched_shas), "sha", "left_semi")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("sha").orderBy(F.asc("doc_id"))),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "sha", "quality")
        .persist()
    )
    need_text = winners.join(F.broadcast(
        eligible.select("doc_id")), "doc_id", "left_anti").select("doc_id")
    extra = remaining.join(F.broadcast(need_text), "doc_id", "left_semi")
    texts = _eligible(  # re-clean is identity for untouched docs (no flip)
        boilerplate_prune_with_state(extra, state2, min_df=min_df)
        .select("doc_id", F.col("clean_text").alias("text")),
        min_quality, allowed_langs, max_dup_2gram,
    ).select("doc_id", "text").unionByName(eligible.select("doc_id", "text"))
    win_docs = winners.join(texts, "doc_id").select("doc_id", "sha", "quality", "text")
    chunks = (
        chunk_documents(win_docs.select("doc_id", "text"), size=size, overlap=overlap)
        .join(win_docs.select("doc_id", "sha", F.round("quality", 6).alias("quality")),
              "doc_id")
        .select("doc_id", "chunk_id", "part_index", "total_parts", "n_tokens",
                "quality", "sha")
    )

    counters = {
        "retracted_docs": gone.count(),
        "recleaned_docs": redo.count(),
        "touched_hashes": touched_shas.count(),
    }
    remaining = remaining.persist()
    remaining.count()
    stats = wh.upsert_buckets(
        spark, "cur_chunks", chunks, touched_shas, delete_col="sha",
        bucket_col="doc_id", n_buckets=n_buckets,
    )
    wh.commit(state2, "segment_df")
    wh.commit(doc_hash, "doc_hash")
    wh.commit(remaining, "docs_raw")
    counters.update({k: v for k, v in stats.items() if isinstance(v, (int, float))})
    wh.record_metrics(spark, "curation_retract", counters)
    for df in (ids, gone, state2, redo, eligible, doc_hash, winners, remaining):
        df.unpersist()
    return counters


def run_curation_stream(
    spark: SparkSession,
    input_dir: str,
    wh: Warehouse,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Watch a directory of document parquet files and keep the curated
    chunk table current (availableNow drains pending input and stops)."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        curate_increment(wh, batch_df, **kwargs)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    trigger = {"availableNow": True} if available_now else {"processingTime": "2 seconds"}
    return writer.trigger(**trigger).start()
