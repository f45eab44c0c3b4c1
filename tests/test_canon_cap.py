"""Canonicalization LSH cap: a planted hot candidate bucket is capped AND
observed (VERDICT r2 Wrong #2) — never a silent quadratic blow-up, never a
silent drop."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.components import (
    canonical_map_with_drops,
    sameas_edges_with_drops,
)


def _entities(spark, names):
    return spark.createDataFrame(
        [(f"e{i:03d}", n, "org") for i, n in enumerate(names)],
        "ent_id string, canonical_name string, entity_type string",
    )


def test_hot_bucket_capped_and_counted(spark):
    # 30 entities share the first token "the" (→ one hot tok: bucket) but
    # are pairwise dissimilar, so the bucket contributes no accepted pairs:
    # capping it must change NOTHING except skipping ~30² candidate checks.
    hot = [f"the {w}{i} division{i}" for i, w in enumerate(
        ["aard", "boba", "cati", "dodo", "emus", "finch", "gnu", "heron",
         "ibis", "jay", "kiwi", "lark", "mole", "newt", "orca", "pika",
         "quail", "rhea", "sloth", "tapir", "urial", "vole", "wren", "xerus",
         "yak", "zebu", "asp", "boar", "crane", "dove"])]
    twins = ["Crimson Falcon Systems", "Crimson Falcon Systems Inc"]
    ents = _entities(spark, hot + twins)

    pairs_uncapped, dropped0 = sameas_edges_with_drops(ents, max_bucket_size=None)
    pairs_capped, dropped = sameas_edges_with_drops(ents, max_bucket_size=10)
    assert dropped0.count() == 0
    drows = dropped.collect()
    assert any(r["key"] == "tok:the" and r["bucket_size"] == 30 for r in drows)
    # the accepted pair set is unchanged: the twins still merge (their LSH
    # band buckets are under the cap), the hot bucket held no real pairs
    assert sorted(map(tuple, pairs_capped.select("src", "dst").collect())) == \
        sorted(map(tuple, pairs_uncapped.select("src", "dst").collect()))

    cmap, _ = canonical_map_with_drops(ents, max_bucket_size=10)
    by_ent = {r["ent_id"]: r["canonical_id"] for r in cmap.collect()}
    assert by_ent["e030"] == by_ent["e031"]  # twins merged
    assert len({by_ent[f"e{i:03d}"] for i in range(30)}) == 30  # hot set unmerged


def test_build_graph_records_drop_metric(spark, tmp_path_factory):
    """The production path records dropped_sameas_buckets in _metrics."""
    from augmented_codebase_indexer_spark.corpus.generator import (
        generate_corpus,
        write_corpus,
    )
    from augmented_codebase_indexer_spark.plans.pipeline import build_graph
    from augmented_codebase_indexer_spark.sources.catalog import Warehouse

    d = tmp_path_factory.mktemp("mini_corpus")
    write_corpus(generate_corpus(n_pages=30, n_entities=16, seed=7), str(d))
    pages = spark.read.parquet(f"{d}/pages.parquet")
    gaz = spark.read.parquet(f"{d}/gazetteer.parquet")
    wh_path = str(tmp_path_factory.mktemp("wh_drop_metric"))
    build_graph(spark, pages, gaz, wh_path, run_id="m")
    m = Warehouse(wh_path, "m").metrics(spark).filter(
        (F.col("source") == "canonicalize")
        & (F.col("metric") == "dropped_sameas_buckets")
    ).collect()
    assert len(m) == 1 and m[0]["value"] == 0  # observable, and zero here
