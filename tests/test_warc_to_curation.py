"""Crawl-to-training-data integration: WARC bytes → pages table → text
extraction → hygiene chain → curated chunks. The end-to-end path a user
of this repo actually runs over a Common Crawl slice."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.extraction import extract_stage
from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v2
from augmented_codebase_indexer_spark.sources.warc import read_warc, write_warc

BANNER = "subscribe to the newsletter and accept the cookies now please"
BODIES = [
    "a small boat drifts down the wide green valley while birds sing in the "
    "tall trees and the warm wind moves over the quiet fields of corn",
    "the old clock in the hall strikes nine and the cat walks along the warm "
    "stone wall to find a place in the sun where it can sleep all day",
    "bright kites rise over the open shore as children run along the sand "
    "and the sea rolls in with a slow steady sound under the wide sky",
]


def test_warc_to_curated_chunks(spark, tmp_path):
    pages = []
    for i in range(6):
        body = BODIES[i % 3]
        html = (f"<html><body><p>{BANNER}.</p>"
                f"<p>{body} number {i}</p></body></html>").encode()
        pages.append({
            "url": f"https://site{i}.example/page",
            "warc_ts": "2026-08-16T00:00:00Z",
            "html": html,
        })
    warc_path = str(tmp_path / "crawl.warc.gz")
    write_warc(pages, warc_path)

    page_df = read_warc(spark, warc_path)
    assert page_df.count() == 6

    docs = extract_stage(page_df).select(
        F.abs(F.xxhash64("url")).alias("doc_id"),
        F.col("extracted_text").alias("text"),
    )
    out = curation_pipeline_v2(
        docs, min_quality=0.1, size=10, overlap=0,
        boiler_min_df=3, max_dup_2gram=0.6, seg_sep="\n",
    ).collect()
    # the shared banner is boilerplate (df=6) and must not reach any chunk;
    # all six docs have distinct bodies ("number i") so all survive dedup
    assert len({r["doc_id"] for r in out}) == 6
    total_tokens = {r["doc_id"]: 0 for r in out}
    for r in out:
        total_tokens[r["doc_id"]] += r["n_tokens"]
    banner_len = len(BANNER.split())
    for doc_id, n in total_tokens.items():
        assert n <= max(len(b.split()) for b in BODIES) + 2  # body + "number i"
        assert n >= banner_len  # sanity: bodies are longer than the banner
