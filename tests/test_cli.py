"""CLI wiring gates: each subcommand drives the same library functions
the other tests already verify, so these assert arg→function→JSON
plumbing — index then search/graph/stats/export against the built
warehouse, plus the F4/F5 modifier grammar reaching the search filter."""

import json
import os

import pytest
from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.cli import main


@pytest.fixture(scope="module")
def built(cli_warehouse):
    return cli_warehouse


def test_index_builds_warehouse(built):
    wh, res = built
    assert res["edges"] > 0 and res["nodes"] > 0
    assert os.path.isdir(os.path.join(wh, "edges"))


def test_search_hybrid_and_modifiers(built, capsys):
    wh, _ = built
    res = main(["search", "--warehouse", wh, "-k", "5", "cluster data"])
    assert 0 < len(res["results"]) <= 5
    assert res["query"] == "cluster data"
    for r in res["results"]:
        assert set(r) == {"url", "score", "backend"}
    # printed line is the same JSON (machine-readable contract)
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == res

    # F5 exclusion must drop every excluded url
    excl = main(["search", "--warehouse", wh, "-k", "5",
                 "cluster data -exclude:.example"])
    assert excl["results"] == []  # every corpus url is under *.example
    assert excl["query"] == "cluster data"


def test_search_rerank_mode(built):
    wh, _ = built
    res = main(["search", "--warehouse", wh, "--mode", "rerank", "-k", "3",
                "cluster data"])
    assert 0 < len(res["results"]) <= 3
    for r in res["results"]:
        assert {"url", "rerank_micro", "retrieval_score"} <= set(r)


def test_graph_neighborhood(built):
    wh, res = built
    # pick a real edge endpoint deterministically via stats-free path:
    # the export JSON carries edges; use stats to assert counts first
    stats = main(["stats", "--warehouse", wh])
    assert stats["tables"]["edges"] == res["edges"]
    assert any(l["stage"] == "edges" for l in stats["lineage"])


def test_graph_traversal_from_real_node(built, spark):
    wh, _ = built
    edges = spark.read.parquet(os.path.join(wh, "edges"))
    start = edges.select("subj_id").orderBy("subj_id").first()["subj_id"]
    res = main(["graph", "--warehouse", wh, "--entity", start, "--depth", "2"])
    hops = {n["node_id"]: n["hops"] for n in res["neighbors"]}
    assert hops[start] == 0
    assert any(h == 1 for h in hops.values())
    assert all(h <= 2 for h in hops.values())


def test_context_command(built, spark):
    """query_graph analog: the budgeted package contains the seed at
    hops 0, respects the running-token budget, and orders by rank."""
    wh, _ = built
    edges = spark.read.parquet(os.path.join(wh, "edges"))
    seed = edges.select("subj_id").orderBy("subj_id").first()["subj_id"]
    res = main(["context", "--warehouse", wh, "--entity", seed,
                "--budget", "300"])
    ctx = res["context"]
    assert ctx and res["n_nodes"] == len(ctx)
    assert ctx[0]["node_id"] == seed and ctx[0]["hops"] == 0
    assert all(r["cum_tokens"] <= 300 for r in ctx)
    bigger = main(["context", "--warehouse", wh, "--entity", seed,
                   "--budget", "100000"])
    assert bigger["n_nodes"] >= res["n_nodes"]
    # personalized ranking: same neighborhood membership, seed-centric
    # rank values — the seed's own rank dominates its PPR distribution
    pers = main(["context", "--warehouse", wh, "--entity", seed,
                 "--budget", "100000", "--personalized"])
    assert pers["personalized"] is True
    assert {r["node_id"] for r in pers["context"]} == \
           {r["node_id"] for r in bigger["context"]}
    pr_of = {r["node_id"]: r["pagerank"] for r in pers["context"]}
    assert pr_of[seed] == max(pr_of.values())


def test_export_graphml(built, tmp_path):
    wh, res = built
    out = str(tmp_path / "g.xml")
    r = main(["export", "--warehouse", wh, "--format", "graphml", "--out", out])
    assert r["nodes"] == res["nodes"] and r["edges"] == res["edges"]
    body = open(out).read()
    assert body.count("<node ") == res["nodes"]


def test_watch_verb_drains_pages(built, spark, corpus_dir, tmp_path):
    """`watch` (drain mode) folds a directory of page files into the
    warehouse through the streaming upsert path: re-streaming the build's
    own pages reconverges to the batch edge/node counts, and re-draining
    with the same checkpoint is exactly-once."""
    import shutil

    src_wh, res = built
    wh = str(tmp_path / "wh_copy")  # don't mutate the shared fixture
    shutil.copytree(src_wh, wh)
    stream_in = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    argv = ["watch", "--input", stream_in,
            "--gazetteer", os.path.join(corpus_dir, "gazetteer.parquet"),
            "--warehouse", wh, "--checkpoint", ckpt]
    spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))\
        .write.mode("overwrite").parquet(stream_in)
    r1 = main(argv)
    assert r1["edges"] == res["edges"] and r1["nodes"] == res["nodes"]
    # exactly-once: re-draining with the same checkpoint changes nothing
    assert main(argv) == r1


def test_watch_verb_join_tier_over_cap(built, spark, corpus_dir, tmp_path,
                                       monkeypatch):
    """An over-cap gazetteer must route the watch stream through the
    relational join tier (no driver-side gazetteer collect) and still
    converge to the batch counts — cmd_watch shares linker_stages'
    counted size branch with the batch build (VERDICT r4 Wrong #2)."""
    import dataclasses
    import shutil

    from augmented_codebase_indexer_spark import config as cfg_mod

    monkeypatch.setattr(
        cfg_mod, "DEFAULT",
        dataclasses.replace(cfg_mod.DEFAULT, gazetteer_broadcast_max_rows=0),
    )
    src_wh, res = built
    wh = str(tmp_path / "wh_copy")
    shutil.copytree(src_wh, wh)
    stream_in = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))\
        .write.mode("overwrite").parquet(stream_in)
    r = main(["watch", "--input", stream_in,
              "--gazetteer", os.path.join(corpus_dir, "gazetteer.parquet"),
              "--warehouse", wh, "--checkpoint", ckpt])
    assert r["edges"] == res["edges"] and r["nodes"] == res["nodes"]


def test_export_import_roundtrip(built, tmp_path):
    """export json → import replace into a fresh warehouse: counts match
    the source build; graph/search reads work on the imported copy."""
    import shutil

    src_wh, res = built
    out = str(tmp_path / "dump")
    main(["export", "--warehouse", src_wh, "--format", "json", "--out", out])
    wh2 = str(tmp_path / "wh2")
    shutil.copytree(src_wh, wh2)  # bring the non-graph tables along
    r = main(["import", "--warehouse", wh2, "--format", "json",
              "--src", out])
    assert r["nodes"] == res["nodes"] and r["edges"] == res["edges"]
    stats = main(["stats", "--warehouse", wh2])
    assert stats["tables"]["edges"] == res["edges"]
    # merge mode over the same data dedupes back to identical counts
    r2 = main(["import", "--warehouse", wh2, "--format", "json",
               "--mode", "merge", "--src", out])
    assert (r2["nodes"], r2["edges"]) == (res["nodes"], res["edges"])


def test_export_ntriples(built, tmp_path, spark):
    import glob

    wh, res = built
    out = str(tmp_path / "nt")
    r = main(["export", "--warehouse", wh, "--format", "ntriples", "--out", out])
    assert r["edges"] == res["edges"]
    lines = [ln for p in glob.glob(f"{out}/part-*") for ln in open(p) if ln.strip()]
    assert sum(1 for ln in lines if "/rel/" in ln) == res["edges"]


def test_search_quoted_phrase_filter(built, spark):
    wh, _ = built
    # pick a real consecutive bigram from one extracted doc — the quoted
    # form must keep that doc eligible and drop docs lacking the exact
    # adjacency (token-set search would keep them)
    import re as _re

    row = (
        spark.read.parquet(os.path.join(wh, "extracted"))
        .selectExpr("url", "extracted_text")
        .filter(F.length("extracted_text") > 50)
        .orderBy("url")
        .first()
    )
    toks = [t for t in _re.split(r"[^a-z0-9]+", row["extracted_text"].lower()) if t]
    phrase = f"{toks[0]} {toks[1]}"
    res = main(["search", "--warehouse", wh, "-k", "50", f'"{phrase}"'])
    assert res["results"], phrase
    # every hit really contains the exact consecutive phrase
    urls = [r["url"] for r in res["results"]]
    texts = {
        r["url"]: r["extracted_text"].lower()
        for r in spark.read.parquet(os.path.join(wh, "extracted"))
        .filter(F.col("url").isin(urls))
        .select("url", "extracted_text")
        .collect()
    }
    for u in urls:
        flat = " ".join(_re.split(r"[^a-z0-9]+", texts[u]))
        assert phrase in flat, u
    # an impossible quoted phrase filters everything
    none = main(["search", "--warehouse", wh, "-k", "5",
                 '"zzzqqq xxxvvv"'])
    assert none["results"] == []


def test_stats_sketch_estimates_within_4_sigma(built):
    """VERDICT r5 Next #9: `stats --sketch` reads the HLL register path
    instead of exact countDistinct. The m-register HLL standard error is
    1.04/sqrt(m); every per-table estimate must land within 4 sigma of
    the exact distinct count, and the payload must say it's an estimate."""
    from augmented_codebase_indexer_spark.operators.hll import M

    wh, _ = built
    exact = main(["stats", "--warehouse", wh])
    est = main(["stats", "--warehouse", wh, "--sketch"])
    assert exact["tables"] == est["tables"]  # row counts stay exact
    sigma = 1.04 / (M ** 0.5)
    checked = 0
    for table, d in exact["distinct"].items():
        e = est["distinct"][table]
        assert "estimate" in e and "exact" not in e
        assert "display-only" in e["method"]
        true = d["exact"]
        if true == 0:
            continue
        assert abs(e["estimate"] - true) <= 4 * sigma * true + 1, (table, e, true)
        checked += 1
    assert checked >= 3  # extracted / edges / nodes at minimum


def test_search_snippets_flag(built):
    wh, _ = built
    res = main(["search", "--warehouse", wh, "-k", "3", "--snippets", "3",
                "cluster data"])
    assert res["results"]
    for r in res["results"]:
        assert set(r) == {"url", "score", "backend", "snippet"}
        # when a covering span exists, the snippet contains a query term
        if r["snippet"] is not None:
            assert "cluster" in r["snippet"] or "data" in r["snippet"]
    assert any(r["snippet"] for r in res["results"])
    # without the flag the payload shape is unchanged
    plain = main(["search", "--warehouse", wh, "-k", "3", "cluster data"])
    assert all(set(r) == {"url", "score", "backend"} for r in plain["results"])


def test_schema_verb(built):
    wh, _ = built
    res = main(["schema", "--warehouse", wh])
    assert res["predicates_induced"] > 0
    # declarations are (pred, domain, range) triples that cleared the bar
    for pred, dom, rng in res["declarations"]:
        assert pred and dom and rng
    assert res["violations"] >= 0
    assert res["bar"] == {"min_share_micro": 600000, "min_typed": 3}
    # an impossible bar declares nothing and hence violates nothing
    strict = main(["schema", "--warehouse", wh,
                   "--min-share-micro", "1000001"])
    assert strict["declarations"] == [] and strict["violations"] == 0
