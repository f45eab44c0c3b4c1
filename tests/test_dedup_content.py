"""Content-dedup build path: processing each distinct html once and fanning
triples out to urls must equal the per-url build exactly (the corpus plants a
duplicate-content page at a different url)."""

from augmented_codebase_indexer_spark.plans.pipeline import build_graph


def _edges(spark, wh):
    return {
        (r["subj_id"], r["pred"], r["obj_id"], r["url"], r["pos"])
        for r in spark.read.parquet(f"{wh}/edges").select(
            "subj_id", "pred", "obj_id", "url", "pos").collect()
    }


def test_dedup_content_build_equals_plain(spark, corpus, corpus_dir, tmp_path_factory):
    wh_a = str(tmp_path_factory.mktemp("wh_plain"))
    wh_b = str(tmp_path_factory.mktemp("wh_dedup"))
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    gaz = spark.read.parquet(f"{corpus_dir}/gazetteer.parquet")
    build_graph(spark, pages, gaz, wh_a, run_id="plain")
    s = build_graph(spark, pages, gaz, wh_b, run_id="dedup", dedup_content=True)
    assert _edges(spark, wh_a) == _edges(spark, wh_b)
    nodes_a = {
        (r["node_id"], r["mention_count"])
        for r in spark.read.parquet(f"{wh_a}/nodes").collect()
    }
    nodes_b = {
        (r["node_id"], r["mention_count"])
        for r in spark.read.parquet(f"{wh_b}/nodes").collect()
    }
    assert nodes_a == nodes_b
    assert s["edges"] == len(_edges(spark, wh_a))
