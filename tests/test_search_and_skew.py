"""Hybrid search read path, skew-salted operators, context assembly."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.skew import (
    salted_collect_set,
    salted_count,
    salted_join,
)
from augmented_codebase_indexer_spark.plans.context import assemble_context
from augmented_codebase_indexer_spark.plans.search import hybrid_search

SF = "/root/testdata/sf0.001"


def test_salted_ops_equal_plain(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    plain = {
        (r["event_type"], r["n"])
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    salted = {(r["event_type"], r["n"]) for r in salted_count(e, "event_type", "event_id").collect()}
    assert salted == plain

    plain_sets = {
        r["event_type"]: set(r["s"])
        for r in e.groupBy("event_type").agg(F.collect_set("user_id").alias("s")).collect()
    }
    salted_sets = {
        r["event_type"]: set(r["user_id_set"])
        for r in salted_collect_set(e, "event_type", "user_id", "event_id").collect()
    }
    assert salted_sets == plain_sets


def test_salted_join_equal_plain(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    dim = spark.createDataFrame(
        [("click", 1.0), ("error", 5.0), ("signup", 2.0)], ["event_type", "weight"]
    )
    plain = e.join(dim, "event_type").agg(F.sum(F.col("value") * F.col("weight"))).collect()[0][0]
    salted = (
        salted_join(e, dim, "event_type")
        .agg(F.sum(F.col("value") * F.col("weight")))
        .collect()[0][0]
    )
    assert abs(plain - salted) < 1e-6


def test_hot_entity_skew_handled(spark, corpus, corpus_dir, tmp_path_factory):
    """The corpus plants a hot entity (~15% of facts). The nodes aggregate
    and the salted equivalents must agree on its count."""
    wh = str(tmp_path_factory.mktemp("wh_skew"))
    from augmented_codebase_indexer_spark.plans.pipeline import build_graph

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    gaz = spark.read.parquet(f"{corpus_dir}/gazetteer.parquet")
    build_graph(spark, pages, gaz, wh, run_id="skew")
    edges = spark.read.parquet(f"{wh}/edges")
    plain = {
        (r["subj_id"], r["n"])
        for r in edges.groupBy("subj_id").agg(F.count("*").alias("n")).collect()
    }
    salted = {(r["subj_id"], r["n"]) for r in salted_count(edges, "subj_id", "url").collect()}
    assert salted == plain
    # skew actually exists: top subject should dominate
    top = max(n for _, n in plain)
    assert top >= 5


def test_hybrid_search_shape_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    r1 = hybrid_search(docs, "spark window join", k=10).collect()
    r2 = hybrid_search(docs, "spark window join", k=10).collect()
    assert [tuple(x) for x in r1] == [tuple(x) for x in r2]
    assert 0 < len(r1) <= 10
    # scores sorted desc with deterministic tie-break
    scores = [x["score"] for x in r1]
    assert scores == sorted(scores, reverse=True)
    # pattern scores normalized onto the vector scale: no pattern score above max vector
    backends = {x["backend"] for x in r1}
    assert backends <= {"pattern", "vector"}


def test_context_assembly_budget(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "e"), ("e", "f")],
        ["subj_id", "obj_id"],
    )
    nodes = spark.createDataFrame(
        [(x, f"name-{x}", "org") for x in "abcdef"],
        ["node_id", "canonical_name", "entity_type"],
    )
    ranks = spark.createDataFrame(
        [("a", 0.1), ("b", 0.5), ("c", 0.4), ("d", 0.3), ("e", 0.2), ("f", 0.05)],
        ["node_id", "pagerank"],
    )
    out = assemble_context(edges, nodes, ranks, ["a"], depth=3,
                           token_budget=200, tokens_per_node=50,
                           count_tokens=False)
    rows = {r["node_id"]: r for r in out.collect()}
    assert "a" in rows  # seed survives
    assert len(rows) == 4  # 200/50 budget
    # highest-pagerank neighbors kept (b .5, c .4, d .3)
    assert set(rows) == {"a", "b", "c", "d"}


def test_context_assembly_real_token_counts(spark):
    """Budget fidelity: node cost = real rendered token count + envelope,
    so a long canonical name displaces more of the budget than a short one
    (the reference re-counts actual content, context_assembler.py:418-510)."""
    edges = spark.createDataFrame([("a", "b"), ("a", "c")], ["subj_id", "obj_id"])
    nodes = spark.createDataFrame(
        [("a", "seed", "org"),
         ("b", "a very long canonical name with many tokens inside it", "org"),
         ("c", "short", "org")],
        ["node_id", "canonical_name", "entity_type"],
    )
    ranks = spark.createDataFrame(
        [("a", 0.1), ("b", 0.5), ("c", 0.4)], ["node_id", "pagerank"]
    )
    # per-node cost = rendered tokens (name + type) + envelope 10:
    # a = 2+10 = 12, b = 11+10 = 21, c = 2+10 = 12; order a, b, c
    out = assemble_context(edges, nodes, ranks, ["a"], depth=1,
                           token_budget=25, tokens_per_node=10)
    rows = {r["node_id"]: r["n_tokens"] for r in out.collect()}
    assert rows == {"a": 12}  # b pushes cum to 33 > 25; c sorts after b
    out2 = assemble_context(edges, nodes, ranks, ["a"], depth=1,
                            token_budget=100, tokens_per_node=10)
    rows2 = {r["node_id"]: r["n_tokens"] for r in out2.collect()}
    assert rows2 == {"a": 12, "b": 21, "c": 12}
    # tokenizer hook: a custom counter (here char-based, a stand-in for a
    # real BPE) drives the budget instead of the whitespace heuristic
    out3 = assemble_context(edges, nodes, ranks, ["a"], depth=1,
                            token_budget=100, tokens_per_node=10,
                            token_counter=lambda s: len(s))
    rows3 = {r["node_id"]: r["n_tokens"] for r in out3.collect()}
    # char-cost: a=18, b=67 (cum 85 fits), c=19 (cum 104 busts the budget)
    assert rows3 == {"a": len("seed org") + 10,
                     "b": len("a very long canonical name with many tokens "
                              "inside it org") + 10}
