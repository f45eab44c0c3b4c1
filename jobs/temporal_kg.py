"""spark-submit entrypoint for the nightly TEMPORAL KG build — extract
crawl-timestamped facts from pages and materialize the SCD2 interval
table as resumable warehouse stages:

    spark-submit --py-files aci_spark.zip jobs/temporal_kg.py \
        --pages <pages parquet> --gazetteer <gazetteer parquet> \
        --warehouse <output dir> [--run-id temporal-0] [--as-of <epoch>]

Stages (each one atomic commit + lineage row + checkpoint; a killed run
re-submitted with the same --run-id resumes after the last committed
stage):

    facts  — resolved (subj_id, pred, obj_id) triples joined with the
             page's warc_ts (int64 epoch seconds), bucketed by subj_id
             so downstream per-entity reads prune;
    scd2   — validity intervals per (subj_id, pred) via the
             gaps-and-islands pass (ONE entity-key exchange), bucketed
             the same way;
    snapshot (only with --as-of) — the graph as of the given time.

The printed JSON carries the stage counters; incremental nights use
`streaming/temporal_stream.py` against the same tables instead of a
full rebuild.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--gazetteer", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default="temporal-0")
    ap.add_argument("--as-of", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from augmented_codebase_indexer_spark.config import PipelineConfig
    from augmented_codebase_indexer_spark.operators.extraction import extract_stage
    from augmented_codebase_indexer_spark.operators.temporal import (
        scd2_intervals,
        snapshot_asof,
    )
    from augmented_codebase_indexer_spark.plans.pipeline import linker_stages
    from augmented_codebase_indexer_spark.session import get_spark
    from augmented_codebase_indexer_spark.sources.catalog import Warehouse, run_stage

    spark = get_spark(app_name=f"aci-temporal-{args.run_id}")
    wh = Warehouse(args.warehouse, args.run_id)
    pages = spark.read.parquet(args.pages)
    gaz = spark.read.parquet(args.gazetteer)
    cfg = PipelineConfig()
    _, triple_fn, link_fn = linker_stages(spark, gaz, cfg)

    def build_facts():
        extracted = extract_stage(pages).filter(
            F.col("lang").isin(*cfg.allowed_langs)
            & (F.length("extracted_text") > 0)
        )
        kg = link_fn(triple_fn(extracted)).filter(F.col("resolved"))
        return kg.join(
            pages.select("url", F.col("warc_ts").cast("long").alias("ts")), "url"
        ).select("subj_id", "pred", F.col("obj_id").alias("obj"), "ts")

    facts = run_stage(wh, spark, "facts", "temporal_facts", build_facts,
                      bucket_col="subj_id", n_buckets=8)

    scd2 = run_stage(
        wh, spark, "scd2", "scd2",
        lambda: scd2_intervals(facts, key_cols=("subj_id", "pred")),
        bucket_col="subj_id", n_buckets=8,
    )

    counters = {
        "pages": pages.count(),
        "facts": facts.count(),
        "keys": scd2.select("subj_id", "pred").distinct().count(),
        "versions": scd2.count(),
        "current": scd2.filter(F.col("is_current")).count(),
    }
    if args.as_of > 0:
        snap = run_stage(
            wh, spark, "snapshot", f"snapshot_{args.as_of}",
            lambda: snapshot_asof(scd2, args.as_of),
            bucket_col="subj_id", n_buckets=8,
        )
        counters["snapshot_rows"] = snap.count()

    print(json.dumps(counters))
    spark.stop()


if __name__ == "__main__":
    main()
