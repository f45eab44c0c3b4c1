"""Per-row invariant (BASELINE.json input_hint): extracted text per url is
byte-identical between the Spark vectorized UDF and the pure-Python oracle."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.functions.textextract import extract_text
from augmented_codebase_indexer_spark.operators.extraction import extract_stage


def test_extract_byte_identical(spark, corpus, corpus_dir):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    got = {
        r["url"]: r["extracted_text"]
        for r in extract_stage(pages).collect()
    }
    oracle = {}
    for p in corpus.pages:
        t = extract_text(p["html"])
        if t is not None:
            oracle[p["url"]] = t
    assert set(got) == set(oracle)
    for url, text in oracle.items():
        assert got[url] == text, f"extraction mismatch at {url}"


def test_skip_rules(spark, corpus_dir):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    out = extract_stage(pages)
    urls = {r["url"] for r in out.select("url").collect()}
    assert "https://edge.example/binary" not in urls
    assert "https://edge.example/badutf8" not in urls
    # empty/boilerplate pages survive extraction with empty text
    empties = out.filter(F.length("extracted_text") == 0).count()
    assert empties >= 2


def test_boilerplate_removed(spark, corpus_dir):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    sample = extract_stage(pages).filter(F.length("extracted_text") > 0).limit(20).collect()
    for r in sample:
        t = r["extracted_text"]
        assert "copyright 2026" not in t  # footer stripped
        assert "subscribe now" not in t   # aside/ads stripped
        assert "window.trk" not in t      # script stripped
        assert "<" not in t and ">" not in t
