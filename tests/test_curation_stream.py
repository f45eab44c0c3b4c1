"""Continuous curation: the incremental hygiene stream converges to the
batch pipeline's output regardless of arrival order, including verdict
flips (re-cleans) and dedup-winner promotion by late-arriving smaller ids."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v2
from augmented_codebase_indexer_spark.sources.catalog import Warehouse
from augmented_codebase_indexer_spark.streaming.curation_stream import (
    curate_increment,
    run_curation_stream,
)

BANNER = "subscribe to the newsletter and accept the cookies now please"
BODY_A = ("a small boat drifts down the wide green valley while birds sing "
          "in the tall trees and the warm wind moves over the quiet fields "
          "of corn near the farm in the early light of the day")
BODY_B = ("the old clock in the hall strikes nine and the cat walks along "
          "the warm stone wall to find a place in the sun where it can "
          "sleep for most of the afternoon without any noise at all")

KW = dict(min_df=3, min_quality=0.1, max_dup_2gram=0.6, size=10, overlap=0)


def _rows():
    # batch 1: banner appears twice (df=2 < min_df=3 → still content).
    # batch 2 pushes the banner to df=5 (→ re-clean of both batch-1 docs)
    # and brings doc 5 — a SMALLER id duplicating doc 20's body, which
    # must steal its dedup-winner slot. BODY_B stays at df=2 (content).
    b1 = [(20, f"{BANNER}. {BODY_B}"),
          (40, f"{BANNER}. {BODY_A}")]
    b2 = [(5, f"{BANNER}. {BODY_B}"),
          (50, f"{BANNER}. {BODY_A} extra tail words here"),
          (60, f"{BANNER}. {BODY_A} another distinct ending")]
    return b1, b2


def _chunks(spark, wh_root):
    return {
        (r["doc_id"], r["chunk_id"], r["part_index"], r["total_parts"],
         r["n_tokens"], r["quality_micro"])
        for r in spark.read.parquet(f"{wh_root}/cur_chunks").select(
            "doc_id", "chunk_id", "part_index", "total_parts", "n_tokens",
            "quality_micro").collect()
    }


def _batch_reference(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        tuple(r) for r in curation_pipeline_v2(
            docs, min_quality=KW["min_quality"], boiler_min_df=KW["min_df"],
            max_dup_2gram=KW["max_dup_2gram"], size=KW["size"],
            overlap=KW["overlap"],
        ).collect()
    }


def test_curation_increments_converge_to_batch(spark, tmp_path_factory):
    b1, b2 = _rows()
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_cur")), "cur")
    c1 = curate_increment(
        wh, spark.createDataFrame(b1, "doc_id long, text string"), **KW)
    assert c1["recleaned_docs"] == 0
    # after batch 1 the banner is content (df=2 < 3): winner chunks exist
    # for docs 20 and 40
    mid_ids = {r[0] for r in _chunks(spark, wh.root)}
    assert mid_ids == {20, 40}

    c2 = curate_increment(
        wh, spark.createDataFrame(b2, "doc_id long, text string"), **KW)
    # the banner crossed min_df → both batch-1 docs carry it → re-clean
    assert c2["recleaned_docs"] == 2

    got = _chunks(spark, wh.root)
    want = _batch_reference(spark, b1 + b2)
    assert got == want and len(got) > 0
    # promotion happened: doc 5 now owns BODY_B's chunks, doc 20 is gone
    final_ids = {r[0] for r in got}
    assert 5 in final_ids and 20 not in final_ids


def test_reingest_update_converges_to_batch(spark, tmp_path_factory):
    """ADVICE r3: a re-ingested (updated) doc_id must behave as
    retract-old + insert-new, not as a pure insert — the old text's
    segment counts retract (no stale segment rows; a banner carried only
    by the OLD version can drop below min_df), and the old text must
    never co-exist with the new one inside the prune's groupBy."""
    b1 = [(10, f"{BANNER}. {BODY_A}"),
          (20, f"{BANNER}. {BODY_B}"),
          (30, f"{BANNER}. {BODY_A} with its own calm tail here")]
    # update 10 and 30: both drop the banner → banner df falls 3 → 1,
    # crossing min_df downward, so doc 20 must re-clean and GROW the
    # banner back; doc 10's new text duplicates BODY_B → dedup contest
    b2 = [(10, f"{BODY_B}"),
          (30, f"{BODY_A} rewritten with another quiet ending now")]
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_upd")), "upd")
    curate_increment(wh, spark.createDataFrame(b1, "doc_id long, text string"), **KW)
    c2 = curate_increment(
        wh, spark.createDataFrame(b2, "doc_id long, text string"), **KW)
    assert c2["updated_docs"] == 2
    assert c2["recleaned_docs"] == 1  # doc 20 re-cleans; 10/30 are in-batch

    # state table matches a from-scratch frequency pass over LATEST texts
    latest = [(10, b2[0][1]), (20, b1[1][1]), (30, b2[1][1])]
    from augmented_codebase_indexer_spark.operators.curation_filters import (
        segment_doc_counts,
    )
    got_state = {(r["seg"], r["df"]) for r in spark.read.parquet(
        f"{wh.root}/segment_df").select("seg", "df").collect()}
    want_state = {(r["seg"], r["df"]) for r in segment_doc_counts(
        spark.createDataFrame(latest, "doc_id long, text string")).collect()}
    assert got_state == want_state

    got = _chunks(spark, wh.root)
    want = _batch_reference(spark, latest)
    assert got == want and len(got) > 0
    # dedup after the update: 10 and 20's latest texts differ (20 kept the
    # banner), so both survive; the winner set is exactly the batch one
    assert {r[0] for r in got} == {r[0] for r in want}


def test_retraction_converges_to_batch_over_remaining(spark, tmp_path_factory):
    """Deleting docs must converge to a fresh batch run over the survivors:
    the banner drops below min_df and GROWS BACK into the remaining docs'
    text, and a retracted dedup winner hands its slot to the runner-up."""
    from augmented_codebase_indexer_spark.streaming.curation_stream import retract_docs

    rows = [(10, f"{BANNER}. {BODY_A}"),
            (20, f"{BANNER}. {BODY_B}"),      # winner of BODY_B's hash
            (30, f"{BANNER}. {BODY_B}"),      # runner-up
            (40, f"{BANNER}. {BODY_A} with a different calm ending here")]
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_retract")), "ret")
    curate_increment(wh, spark.createDataFrame(rows, "doc_id long, text string"), **KW)
    # banner df=4 ≥ 3 → boilerplate; BODY_B winner is 20
    ids0 = {r[0] for r in _chunks(spark, wh.root)}
    assert 20 in ids0 and 30 not in ids0

    c = retract_docs(
        wh, spark.createDataFrame([(10,), (20,)], "doc_id long"), **KW)
    assert c["retracted_docs"] == 2
    # banner df fell to 2 < 3 → both survivors re-clean (text grows back)
    assert c["recleaned_docs"] == 2

    got = _chunks(spark, wh.root)
    want = _batch_reference(spark, [r for r in rows if r[0] not in (10, 20)])
    assert got == want and len(got) > 0
    final_ids = {r[0] for r in got}
    assert 30 in final_ids and 20 not in final_ids  # runner-up promoted
    # the re-grown text includes the banner again: chunk token totals for
    # doc 30 cover banner + body
    n30 = sum(r[4] for r in got if r[0] == 30)
    assert n30 == len(f"{BANNER}. {BODY_B}".split())


def test_curation_stream_drain_matches_batch(spark, tmp_path_factory):
    b1, b2 = _rows()
    stream_in = str(tmp_path_factory.mktemp("cur_stream_in"))
    ckpt = str(tmp_path_factory.mktemp("cur_ckpt"))
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_cur_s")), "curs")

    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1)\
        .write.mode("append").parquet(stream_in)
    q = run_curation_stream(spark, stream_in, wh, ckpt, available_now=True, **KW)
    q.awaitTermination(300)

    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1)\
        .write.mode("append").parquet(stream_in)
    q = run_curation_stream(spark, stream_in, wh, ckpt, available_now=True, **KW)
    q.awaitTermination(300)

    assert _chunks(spark, wh.root) == _batch_reference(spark, b1 + b2)
    # exactly-once across restarts: re-draining with the same checkpoint
    # and no new files changes nothing
    before = _chunks(spark, wh.root)
    q = run_curation_stream(spark, stream_in, wh, ckpt, available_now=True, **KW)
    q.awaitTermination(300)
    assert _chunks(spark, wh.root) == before
