"""Incremental invariant (Property-15 analog): after applying the updates
fixture via incremental_update, the edge table equals a FULL rebuild of the
updated corpus; only triples from touched urls changed."""

import pytest
from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.plans.pipeline import build_graph
from augmented_codebase_indexer_spark.operators.incremental import incremental_update
from augmented_codebase_indexer_spark.sources.catalog import Warehouse


def _apply_updates(pages: list[dict], updates: list[dict]) -> list[dict]:
    by_url = {p["url"]: dict(p) for p in pages}
    for u in updates:
        if u["op"] == "delete":
            by_url.pop(u["url"], None)
        elif u["op"] == "modify":
            by_url[u["url"]]["html"] = u["html2"]
        else:  # add
            by_url[u["url"]] = {
                "url": u["url"], "warc_ts": pages[0]["warc_ts"],
                "html": u["html2"], "text": None, "lang": "en",
            }
    return list(by_url.values())


def _edge_set(spark, wh_path):
    return {
        (r["subj_id"], r["pred"], r["obj_id"], r["url"], r["pos"])
        for r in spark.read.parquet(f"{wh_path}/edges").select(
            "subj_id", "pred", "obj_id", "url", "pos").collect()
    }


def test_incremental_equals_full_rebuild(spark, corpus, corpus_dir, tmp_path_factory):
    wh_inc = str(tmp_path_factory.mktemp("wh_inc"))
    wh_full = str(tmp_path_factory.mktemp("wh_full"))
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    gaz = spark.read.parquet(f"{corpus_dir}/gazetteer.parquet")

    # initial build on the original corpus
    build_graph(spark, pages, gaz, wh_inc, run_id="base")
    before = _edge_set(spark, wh_inc)

    # updated snapshot
    updated = _apply_updates(corpus.pages, corpus.updates)
    pages2 = spark.createDataFrame(
        [(p["url"], p["warc_ts"], bytearray(p["html"]) if p["html"] else None, p["text"], p["lang"])
         for p in updated],
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )

    wh_obj = Warehouse(wh_inc, "inc")
    counts = incremental_update(spark, wh_obj, pages2, gaz)
    assert counts.get("new", 0) > 0 and counts.get("deleted", 0) > 0
    assert counts.get("modified", 0) > 0 and counts.get("unchanged", 0) > 0

    # A7: the update recorded its counters in the _metrics table
    m = {r["metric"]: r["value"] for r in wh_obj.metrics(spark).filter(
        F.col("source") == "incremental").collect()}
    assert m.get("new") == counts["new"] and m.get("deleted") == counts["deleted"]
    assert m.get("edges_new", 0) > 0
    # bucket-level MERGE recorded its pruning
    assert 0 < m.get("buckets_rewritten", 0) <= m.get("n_buckets", 0)

    build_graph(spark, pages2, gaz, wh_full, run_id="full")
    inc_edges = _edge_set(spark, wh_inc)
    full_edges = _edge_set(spark, wh_full)
    assert inc_edges == full_edges

    # only touched urls changed
    touched = {u["url"] for u in corpus.updates}
    changed_urls = {e[3] for e in before ^ inc_edges}
    assert changed_urls <= touched
