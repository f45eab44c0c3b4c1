"""spark-submit job entrypoints: the nightly curation job runs end-to-end,
materializes every stage table with lineage, and resumes idempotently."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(wh_dir):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate_corpus.py"),
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--warehouse", wh_dir, "--run-id", "t-job", "--decontam-n", "3",
         "--pack-budget", "128", "--mix-budgets", '{"src0": 400}'],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])

def test_curate_corpus_job_runs_and_resumes(tmp_path):
    wh = str(tmp_path / "wh")
    c1 = _run(wh)
    assert c1["docs_in"] == 500 and c1["chunks_out"] > 0
    assert c1["docs_eligible"] < c1["docs_cleaned"]  # filters actually fire
    for t in ("cleaned_docs", "eligible_docs", "cur_chunks", "training_mix",
              "packed_chunks", "_lineage", "_metrics"):
        assert os.path.isdir(os.path.join(wh, t)), t
    # resume with the same run id: committed stages skip, counters identical
    c2 = _run(wh)
    assert c2 == c1


def _run_temporal(wh_dir, corpus_dir, as_of):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "temporal_kg.py"),
         "--pages", os.path.join(corpus_dir, "pages.parquet"),
         "--gazetteer", os.path.join(corpus_dir, "gazetteer.parquet"),
         "--warehouse", wh_dir, "--run-id", "t-temp",
         "--as-of", str(as_of)],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_temporal_kg_job_runs_and_resumes(tmp_path, corpus_dir):
    as_of = 2_000_000_000  # far future: snapshot == current versions
    wh = str(tmp_path / "wh_t")
    c1 = _run_temporal(wh, corpus_dir, as_of)
    assert c1["facts"] > 0
    assert c1["current"] == c1["keys"]  # exactly one live version per key
    assert c1["versions"] >= c1["keys"]
    assert c1["snapshot_rows"] == c1["current"]
    for t in ("temporal_facts", "scd2", f"snapshot_{as_of}", "_lineage"):
        assert os.path.isdir(os.path.join(wh, t)), t
    c2 = _run_temporal(wh, corpus_dir, as_of)
    assert c2 == c1


def _run_refresh(wh_dir, inputs_dir):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "refresh_crawl.py"),
         "--sitemaps", os.path.join(inputs_dir, "sitemaps.parquet"),
         "--robots", os.path.join(inputs_dir, "robots.parquet"),
         "--fetch-log", os.path.join(inputs_dir, "fetchlog.parquet"),
         "--warehouse", wh_dir, "--run-id", "t-refresh",
         "--per-host-cap", "3"],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_refresh_crawl_job_runs_and_resumes(tmp_path, spark):
    # 2 domains x 5 urls; b.example disallows /p/ for everyone; half the
    # urls already fetched after their lastmod (skip), the rest recrawl
    inputs = str(tmp_path / "in")
    xml = lambda dom: "<urlset>" + "".join(
        f"<url><loc>https://{dom}/p/{i}</loc>"
        f"<lastmod>2026-01-{i + 10:02d}</lastmod></url>" for i in range(5)
    ) + "</urlset>"
    spark.createDataFrame(
        [("a.example", xml("a.example")), ("b.example", xml("b.example"))],
        "domain string, xml string",
    ).write.parquet(os.path.join(inputs, "sitemaps.parquet"))
    spark.createDataFrame(
        [("b.example", "User-agent: *\nDisallow: /p/\n")],
        "domain string, robots_txt string",
    ).write.parquet(os.path.join(inputs, "robots.parquet"))
    # urls 0-1 of each domain fetched far in the future (fresh → skip)
    spark.createDataFrame(
        [(f"https://{d}/p/{i}", 2_000_000_000)
         for d in ("a.example", "b.example") for i in range(2)],
        "url string, fetched_at long",
    ).write.parquet(os.path.join(inputs, "fetchlog.parquet"))

    wh = str(tmp_path / "wh_r")
    c1 = _run_refresh(wh, inputs)
    assert c1["sitemap_entries"] == 10
    assert c1["recrawl_new"] == 6 and c1["recrawl_modified"] == 0
    # b.example's 3 candidates die at the robots gate; a.example keeps 3
    assert c1["queued"] == 3 and c1["hosts"] == 1
    # budget stage: allocations sum EXACTLY to the default budget when
    # hosts exist (min(budget, ...) is not a thing — Hamilton gives the
    # whole budget to the one surviving host)
    assert c1["budget_allocated"] == 10000
    for t in ("sitemap_entries", "recrawl_candidates", "fetch_queue",
              "host_budget", "_lineage"):
        assert os.path.isdir(os.path.join(wh, t)), t
    c2 = _run_refresh(wh, inputs)
    assert c2 == c1


def _run_embedding(wh_dir, corpus_dir):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "embedding_corpus.py"),
         "--pages", os.path.join(corpus_dir, "pages.parquet"),
         "--gazetteer", os.path.join(corpus_dir, "gazetteer.parquet"),
         "--warehouse", wh_dir, "--run-id", "t-emb"],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_embedding_corpus_job_runs_and_resumes(tmp_path, corpus_dir):
    wh = str(tmp_path / "wh_e")
    c1 = _run_embedding(wh, corpus_dir)
    assert c1["edges"] > 0 and c1["walk_rows"] > 0 and c1["pairs"] > 0
    # symmetric skip-gram counts: total occurrences are even
    assert c1["pair_occurrences"] % 2 == 0
    assert c1["negatives"] > 0
    for t in ("emb_triples", "emb_edges", "emb_walks", "emb_pairs",
              "emb_negatives", "_lineage"):
        assert os.path.isdir(os.path.join(wh, t)), t
    # resume with the same run id: committed stages skip, counters identical
    # (the md5-chosen walks/negatives make the restart bit-identical too)
    c2 = _run_embedding(wh, corpus_dir)
    assert c2 == c1


def _run_schema(wh_dir, data_dir):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "schema_qa.py"),
         "--facts", os.path.join(data_dir, "facts.parquet"),
         "--types", os.path.join(data_dir, "types.parquet"),
         "--sightings", os.path.join(data_dir, "sightings.parquet"),
         "--warehouse", wh_dir, "--run-id", "t-schema"],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_schema_qa_job_runs_and_resumes(tmp_path):
    import pandas as pd

    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame(
        [("p1", "works_at", "acme"), ("p2", "works_at", "globex"),
         ("p3", "works_at", "acme"), ("bot9", "works_at", "acme"),
         ("p1", "lives_in", "paris"), ("p2", "lives_in", "c9"),
         ("x1", "tie_pred", "z1"), ("x2", "tie_pred", "z2")],
        columns=["subj", "pred", "obj"],
    ).to_parquet(os.path.join(data, "facts.parquet"))
    pd.DataFrame(
        [("p1", "person"), ("p2", "person"), ("p3", "person"),
         ("bot9", "bot"), ("acme", "org"), ("globex", "org"),
         ("paris", "city"), ("x1", "ta"), ("x2", "tb")],
        columns=["entity", "type"],
    ).to_parquet(os.path.join(data, "types.parquet"))
    pd.DataFrame(
        [("a", "e1", "s1"), ("a", "e2", "s1"), ("a", "e3", "s2"),
         ("a", "e4", "s2"), ("a", "e5", "s3"),
         ("a", "e6", "s1"), ("a", "e6", "s2"),
         ("a", "e7", "s1"), ("a", "e7", "s2"), ("a", "e7", "s3"),
         ("b", "x1", "s1"), ("b", "x1", "s2"), ("b", "x1", "s3"),
         ("b", "x2", "s1"), ("b", "x2", "s2"), ("b", "x2", "s3"),
         ("c", "y1", "s1"), ("c", "y2", "s1"), ("c", "y3", "s2")],
        columns=["class", "entity", "src"],
    ).to_parquet(os.path.join(data, "sightings.parquet"))

    wh = str(tmp_path / "wh")
    c1 = _run_schema(wh, data)
    # only works_at clears the evidence bar; bot9 is its one violation
    assert c1["facts_in"] == 8 and c1["preds_profiled"] == 3
    assert c1["preds_declared"] == 1
    assert c1["violations"] == 1 and c1["published"] == 7
    assert c1["functional_preds"] == 3
    assert c1["classes"] == 3
    assert c1["min_completeness_micro"] == 500_000
    for t in ("pred_profile", "induced_schema", "declarations",
              "schema_violations", "published_facts",
              "class_completeness", "_lineage"):
        assert os.path.isdir(os.path.join(wh, t)), t
    # resume: committed stages skip, counters identical
    c2 = _run_schema(wh, data)
    assert c2 == c1
