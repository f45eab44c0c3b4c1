"""Parity features: evaluation joins, graph export/import, canonicalization
vs the oracle's union-find, warehouse lineage."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.corpus.oracle import sameas_components
from augmented_codebase_indexer_spark.operators.components import canonical_map
from augmented_codebase_indexer_spark.operators.evaluation import (
    mrr,
    recall_at_k,
    triple_pr,
)
from augmented_codebase_indexer_spark.sources.graph_io import export_graph, import_graph


def test_canonical_map_matches_oracle_unionfind(spark, corpus, corpus_dir):
    gaz = spark.read.parquet(f"{corpus_dir}/gazetteer.parquet")
    got = {
        r["ent_id"]: r["canonical_id"]
        for r in canonical_map(
            gaz.select("ent_id", "canonical_name", "entity_type").distinct()
        ).collect()
    }
    want = sameas_components(corpus.gazetteer)
    assert got == want
    assert any(k != v for k, v in got.items())  # twins actually merged


def test_triple_pr_gate(spark):
    pred = spark.createDataFrame(
        [("a", "p", "b", "u1"), ("a", "p", "c", "u2"), ("x", "q", "y", "u3")],
        ["subj_id", "pred", "obj_id", "url"],
    )
    gold = spark.createDataFrame(
        [("a", "p", "b", "u1"), ("a", "p", "c", "u2"), ("z", "q", "y", "u4")],
        ["subj_id", "pred", "obj_id", "url"],
    )
    res = triple_pr(pred, gold)
    assert res["true_positives"] == 2
    assert abs(res["precision"] - 2 / 3) < 1e-9
    assert abs(res["recall"] - 2 / 3) < 1e-9


def test_recall_and_mrr(spark):
    ranked = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3), ("q2", "d", 1), ("q2", "e", 2)],
        ["query_id", "item_id", "rank"],
    )
    rel = spark.createDataFrame(
        [("q1", "b"), ("q1", "z"), ("q2", "e")], ["query_id", "item_id"]
    )
    r = {x["query_id"]: x["recall_at_k"] for x in recall_at_k(ranked, rel, k=2).collect()}
    assert r == {"q1": 0.5, "q2": 1.0}
    m = {x["query_id"]: x["rr"] for x in mrr(ranked, rel).collect()}
    assert m == {"q1": 0.5, "q2": 0.5}


def test_graph_export_import_roundtrip(spark, tmp_path):
    nodes = spark.createDataFrame(
        [("n1", "Acme", "org", "u1", 3)],
        ["node_id", "canonical_name", "entity_type", "first_url", "mention_count"],
    )
    edges = spark.createDataFrame(
        [("n1", "acquired", "n2", "u1", 5, False, 1.0)],
        ["subj_id", "pred", "obj_id", "url", "pos", "inferred", "confidence"],
    )
    out = str(tmp_path / "export")
    export_graph(nodes, edges, out)
    n2, e2 = import_graph(spark, out)
    assert n2.count() == 1 and e2.count() == 1
    assert {r["subj_id"] for r in e2.collect()} == {"n1"}
    # merge mode dedupes on the edge key (UNIQUE constraint analog)
    n3, e3 = import_graph(spark, out, existing_nodes=nodes, existing_edges=edges, mode="merge")
    assert n3.count() == 1 and e3.count() == 1


def test_merge_prefer_deterministic_within_one_frame(spark):
    """ADVICE r5: duplicate keys INSIDE one input must pick a stable
    winner (ordered by the remaining columns), not whichever partition
    arrives first — asserted by running the merge repeatedly over a
    many-partition dupe set."""
    from augmented_codebase_indexer_spark.sources.graph_io import merge_prefer

    dupes = spark.createDataFrame(
        [("k1", v) for v in ("zz", "aa", "mm")] + [("k2", "bb")],
        ["node_id", "val"],
    ).repartition(8)
    empty = spark.createDataFrame([], "node_id string, val string")
    for _ in range(3):
        got = {r["node_id"]: r["val"]
               for r in merge_prefer(dupes, empty, ["node_id"]).collect()}
        assert got == {"k1": "aa", "k2": "bb"}  # min by non-key column


def test_ntriples_roundtrip(spark, tmp_path):
    """RDF N-Triples: IRIs url-encoded (spaces, angle brackets), literals
    escaped per the W3C grammar INCLUDING the pathological
    backslash-then-n case that a naive ordered unescape corrupts."""
    from augmented_codebase_indexer_spark.sources.graph_io import (
        export_ntriples,
        import_ntriples,
    )

    nodes = spark.createDataFrame(
        [("n one", 'Say "hi"\tok', "org"),
         ("n2", r"back\slash" + r"\n literal", "place"),  # \n as TEXT, not newline
         ("n3", None, "thing")],
        ["node_id", "canonical_name", "entity_type"],
    )
    edges = spark.createDataFrame(
        [("n one", "acquired <fast>", "n2"), ("n2", "located_in", "n3")],
        ["subj_id", "pred", "obj_id"],
    )
    out = str(tmp_path / "nt")
    export_ntriples(nodes, edges, out)

    # every emitted line is a syntactically plain one-statement line
    import glob as _glob
    lines = [ln.rstrip("\n") for p in sorted(_glob.glob(f"{out}/part-*"))
             for ln in open(p) if ln.strip()]
    assert all(ln.endswith(" .") and ln.startswith("<") for ln in lines)
    assert len(lines) == 2 + 2 + 3  # edges + names(2 non-null) + types(3)

    n2, e2 = import_ntriples(spark, out)
    assert {(r["subj_id"], r["pred"], r["obj_id"]) for r in e2.collect()} == {
        ("n one", "acquired <fast>", "n2"), ("n2", "located_in", "n3")
    }
    got = {r["node_id"]: (r["canonical_name"], r["entity_type"])
           for r in n2.collect()}
    assert got["n one"] == ('Say "hi"\tok', "org")
    assert got["n2"] == (r"back\slash" + r"\n literal", "place")
    assert got["n3"] == (None, "thing")


def test_graphml_and_jsonld_roundtrip(spark, tmp_path):
    from augmented_codebase_indexer_spark.sources.graph_io import (
        export_graphml,
        export_jsonld,
        import_graphml,
        import_jsonld,
    )

    nodes = spark.createDataFrame(
        [("n1", "Acme & Sons <weird>", "org"), ("n2", 'Quote"City', "place")],
        ["node_id", "canonical_name", "entity_type"],
    )
    edges = spark.createDataFrame(
        [("n1", "acquired", "n2", "u1", 5), ("n2", "located_in", "n1", "u2", 9)],
        ["subj_id", "pred", "obj_id", "url", "pos"],
    )
    gml = str(tmp_path / "g.graphml")
    export_graphml(nodes, edges, gml)
    n2, e2 = import_graphml(spark, gml)
    assert {tuple(r) for r in n2.select("node_id", "canonical_name").collect()} == {
        ("n1", "Acme & Sons <weird>"), ("n2", 'Quote"City')  # XML-escaped ok
    }
    assert {(r["subj_id"], r["pred"], r["obj_id"]) for r in e2.collect()} == {
        ("n1", "acquired", "n2"), ("n2", "located_in", "n1")
    }

    out = str(tmp_path / "ld")
    export_jsonld(nodes, edges, out)
    n3, e3 = import_jsonld(spark, out)
    assert {r["node_id"] for r in n3.collect()} == {"n1", "n2"}
    assert {(r["subj_id"], r["pred"], r["obj_id"], r["url"], r["pos"])
            for r in e3.collect()} == {
        ("n1", "acquired", "n2", "u1", 5), ("n2", "located_in", "n1", "u2", 9)
    }
    # the written records really are JSON-LD objects
    import glob as _glob
    import json as _json
    lines = [ln for p in sorted(_glob.glob(f"{out}/nodes_jsonld/part-*.json"))
             for ln in open(p) if ln.strip()]
    sample = _json.loads(lines[0])
    assert sample["@context"] and sample["@type"] == "Thing" and sample["@id"]


def test_profile_approx_switch(spark):
    from augmented_codebase_indexer_spark.operators.profiling import profile_table

    df = spark.range(0, 20_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    exact = {(r["column"], r["metric"]): r["value"]
             for r in profile_table(df).collect()}
    approx = {(r["column"], r["metric"]): r["value"]
              for r in profile_table(df, approx=True).collect()}
    # self-documenting metric name; value within HLL tolerance of exact
    assert ("k", "distinct_count") in exact and ("k", "approx_distinct_count") in approx
    assert ("k", "distinct_count") not in approx
    for c in ("k", "v"):
        ex, ap = exact[(c, "distinct_count")], approx[(c, "approx_distinct_count")]
        assert abs(ap - ex) / ex < 0.15
    # non-distinct metrics identical in both modes
    for key, val in exact.items():
        if key[1] in ("n_rows", "null_count", "min", "max"):
            assert approx[key] == val
