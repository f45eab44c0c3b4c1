"""Continuous curation — the hygiene chain as a stream, converging to the
batch result no matter how documents arrive.

Each micro-batch maintains three warehouse tables and reconciles exactly
what the batch pipeline (``plans/curation.py::curation_pipeline_v2``)
would have produced over everything seen so far:

* ``segment_df`` — corpus-global segment document-frequency
  (``update_segment_df``: one (seg, delta) aggregation per batch).
* ``doc_hash`` — one slim row (doc_id, sha, quality_micro) per doc currently
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
docs), never O(corpus) — the state tables advance in DELTA form (only
the batch's segments/ids are read, merged, and written back through
bucket-level ``upsert_buckets``; untouched buckets are never scanned).
Deletes go through ``retract_docs`` (same reconcile in reverse). A
re-ingested doc_id is an UPDATE: the old text's segment counts retract
before the new text's are added (insert+retract in one pass), so
re-crawled pages converge exactly like fresh ones.
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
    segment_doc_counts,
    update_segment_df,
)
from ..operators.textstats import lang_id_col, quality_micro_col
from ..sources.catalog import Warehouse

DOCS_SCHEMA = "doc_id long, text string"


def _eligible(cleaned: DataFrame, min_quality: float, allowed_langs: tuple,
              max_dup_2gram: float) -> DataFrame:
    """Per-doc filters on cleaned text → (doc_id, text, sha,
    quality_micro) — the exact-BIGINT gated score (stream must match the
    batch pipeline byte-for-byte, so it shares quality_micro_col)."""
    t = F.col("text")
    return (
        cleaned.filter(F.length(t) > 0)
        .filter(dup_2gram_frac_col(t) <= max_dup_2gram)
        .withColumn("quality_micro", quality_micro_col(t))
        .withColumn("lang_pred", lang_id_col(t))
        .filter((F.col("quality_micro") >= int(round(min_quality * 1_000_000)))
                & F.col("lang_pred").isin(*allowed_langs))
        .select("doc_id", "text", F.sha2(t, 256).alias("sha"), "quality_micro")
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
    timings: dict | None = None,
) -> dict:
    """Process one batch of (doc_id, text) rows; returns reconcile counters.

    ``n_buckets`` must stay constant across all calls against one
    warehouse — bucket discovery and assignment share it.

    Pass a dict as ``timings`` to get the trigger wall attributed to its
    three phases (seconds): ``plan_and_pins`` (frame construction plus
    the two state-pin actions), ``counters`` (the reconcile-counter
    actions — this is where most of the chain actually executes), and
    ``upserts`` (the four bucket-level table swaps + metrics append).
    A nightly stream alerts on the SPLIT, not just the total: a growing
    ``counters`` phase means the O(batch + affected) bound is slipping,
    a growing ``upserts`` phase means bucket skew."""
    import time as _time

    _t0 = _time.monotonic()
    spark = batch_df.sparkSession
    batch_df = batch_df.dropDuplicates(["doc_id"]).persist()
    batch_ids = batch_df.select("doc_id")

    # 0. re-ingested ids: a batch doc_id already in docs_raw is an UPDATE —
    #    its OLD text's segment counts must retract before the new text's
    #    are added, or the state diverges from a batch recompute and a
    #    stale segment row lingers forever (ADVICE r3). ``old_versions``
    #    is O(batch) by construction (semi-join on the batch's own ids).
    raw_old = (wh.read(spark, "docs_raw").select("doc_id", "text")
               if wh.exists("docs_raw") else None)
    old_versions = (
        raw_old.join(F.broadcast(batch_ids), "doc_id", "left_semi").persist()
        if raw_old is not None else None
    )

    # 1. frequency state forward — DELTA form: only the batch's own
    #    segments (NEW text + the retracted OLD text of updated ids) are
    #    read from, merged with, and written back to the state table;
    #    untouched segments are never scanned or rewritten
    state1 = (wh.read(spark, "segment_df").select("seg", "df")
              if wh.exists("segment_df") else None)
    touched_segs = segment_doc_counts(batch_df).select("seg")
    if old_versions is not None:
        touched_segs = touched_segs.unionByName(
            segment_doc_counts(old_versions).select("seg")
        ).distinct()
    touched_segs = touched_segs.persist()
    if state1 is not None:
        seg_before = state1.join(F.broadcast(touched_segs), "seg", "left_semi")
    else:
        seg_before = None
    seg_after = update_segment_df(
        seg_before, added=batch_df, removed=old_versions
    ).persist()
    seg_after.count()  # pin before the state table is upserted underneath it
    state2 = seg_after if state1 is None else (
        state1.join(F.broadcast(touched_segs), "seg", "left_anti")
        .unionByName(seg_after)
    )

    # 2. stale docs from verdict flips (only touched segments can flip).
    #    Batch ids are EXCLUDED from the redo pull: they re-process with
    #    their new text anyway, and unioning their old text here would
    #    feed two texts for one doc_id into the prune's groupBy(doc_id),
    #    merging both versions into one corrupt document (ADVICE r3).
    if raw_old is not None and seg_before is not None:
        raw_rest = raw_old.join(F.broadcast(batch_ids), "doc_id", "left_anti")
        crossed = crossed_segments(seg_before, seg_after, min_df)
        redo_ids = affected_doc_ids(raw_rest, crossed)
        redo = raw_rest.join(F.broadcast(redo_ids), "doc_id", "left_semi")
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
    old_hash = (wh.read(spark, "doc_hash").select("doc_id", "sha", "quality_micro")
                if wh.exists("doc_hash") else None)
    removed_rows = (
        old_hash.join(F.broadcast(touched_ids), "doc_id", "left_semi")
        if old_hash is not None else None
    )
    new_hash = eligible.select("doc_id", "sha", "quality_micro")
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
        .select("doc_id", "sha", "quality_micro")
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
    win_docs = winners.join(texts, "doc_id").select("doc_id", "sha", "quality_micro", "text")
    chunks = (
        chunk_documents(win_docs.select("doc_id", "text"), size=size, overlap=overlap)
        .join(win_docs.select("doc_id", "sha", F.col("quality_micro")),
              "doc_id")
        .select("doc_id", "chunk_id", "part_index", "total_parts", "n_tokens",
                "quality_micro", "sha")
    )

    # 7. counters BEFORE any table mutation (they read the old tables);
    #    then four PARTIAL upserts, every one O(touched), none O(corpus):
    #    cur_chunks by hash, then the three state tables by their keys.
    #    Ordering matters: cur_chunks' plan reads the old doc_hash and
    #    docs_raw tables, so it runs first (its inputs are materialized by
    #    the persist/count pins above).
    _t1 = _time.monotonic()
    eligible.count()
    counters = {
        "batch_docs": batch_df.count(),
        "updated_docs": 0 if old_versions is None else old_versions.count(),
        "recleaned_docs": 0 if redo is None else redo.count(),
        "touched_hashes": touched_shas.count(),
    }
    _t2 = _time.monotonic()
    stats = wh.upsert_buckets(
        spark, "cur_chunks", chunks, touched_shas, delete_col="sha",
        bucket_col="doc_id", n_buckets=n_buckets,
    )
    wh.upsert_buckets(
        spark, "segment_df", seg_after, touched_segs, delete_col="seg",
        bucket_col="seg", n_buckets=n_buckets,
    )
    wh.upsert_buckets(
        spark, "doc_hash", new_hash, touched_ids, delete_col="doc_id",
        bucket_col="doc_id", n_buckets=n_buckets,
    )
    wh.upsert_buckets(
        spark, "docs_raw", batch_df, batch_df.select("doc_id"),
        delete_col="doc_id", bucket_col="doc_id", n_buckets=n_buckets,
    )
    counters.update({k: v for k, v in stats.items() if isinstance(v, (int, float))})
    wh.record_metrics(spark, "curation_stream", counters)
    if timings is not None:
        _t3 = _time.monotonic()
        timings.update(
            plan_and_pins=round(_t1 - _t0, 2),
            counters=round(_t2 - _t1, 2),
            upserts=round(_t3 - _t2, 2),
        )
    for df in (batch_df, touched_segs, seg_after, to_process, eligible,
               doc_hash, winners):
        df.unpersist()
    if old_versions is not None:
        old_versions.unpersist()
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
    raw_old = wh.read(spark, "docs_raw").select("doc_id", "text")
    gone = raw_old.join(F.broadcast(ids), "doc_id", "left_semi").persist()

    # delta-form state decrement: only the retracted docs' segments move
    state1 = wh.read(spark, "segment_df").select("seg", "df")
    touched_segs = segment_doc_counts(gone).select("seg").persist()
    seg_before = state1.join(F.broadcast(touched_segs), "seg", "left_semi")
    seg_after = update_segment_df(seg_before, removed=gone).persist()
    seg_after.count()
    state2 = (
        state1.join(F.broadcast(touched_segs), "seg", "left_anti")
        .unionByName(seg_after)
    )

    remaining = raw_old.join(F.broadcast(ids), "doc_id", "left_anti")
    crossed = crossed_segments(seg_before, seg_after, min_df)
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
    old_hash = wh.read(spark, "doc_hash").select("doc_id", "sha", "quality_micro")
    removed_rows = old_hash.join(F.broadcast(touched_ids), "doc_id", "left_semi")
    new_hash = eligible.select("doc_id", "sha", "quality_micro")
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
        .select("doc_id", "sha", "quality_micro")
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
    win_docs = winners.join(texts, "doc_id").select("doc_id", "sha", "quality_micro", "text")
    chunks = (
        chunk_documents(win_docs.select("doc_id", "text"), size=size, overlap=overlap)
        .join(win_docs.select("doc_id", "sha", F.col("quality_micro")),
              "doc_id")
        .select("doc_id", "chunk_id", "part_index", "total_parts", "n_tokens",
                "quality_micro", "sha")
    )

    eligible.count()
    counters = {
        "retracted_docs": gone.count(),
        "recleaned_docs": redo.count(),
        "touched_hashes": touched_shas.count(),
    }
    stats = wh.upsert_buckets(
        spark, "cur_chunks", chunks, touched_shas, delete_col="sha",
        bucket_col="doc_id", n_buckets=n_buckets,
    )
    wh.upsert_buckets(
        spark, "segment_df", seg_after, touched_segs, delete_col="seg",
        bucket_col="seg", n_buckets=n_buckets,
    )
    wh.upsert_buckets(
        spark, "doc_hash", new_hash, touched_ids, delete_col="doc_id",
        bucket_col="doc_id", n_buckets=n_buckets,
    )
    wh.upsert_buckets(
        spark, "docs_raw", gone.select("doc_id", "text").limit(0), ids,
        delete_col="doc_id", bucket_col="doc_id", n_buckets=n_buckets,
    )
    counters.update({k: v for k, v in stats.items() if isinstance(v, (int, float))})
    wh.record_metrics(spark, "curation_retract", counters)
    for df in (ids, gone, touched_segs, seg_after, redo, eligible, doc_hash,
               winners):
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
