"""spark-submit entrypoint for the nightly training-data curation pass —
the hygiene chain (curation v3 semantics) as resumable warehouse stages:

    spark-submit --py-files aci_spark.zip jobs/curate_corpus.py \
        --docs <documents parquet> --warehouse <output dir> \
        [--run-id nightly-0] [--eval-mod 53] [--decontam-n 13] \
        [--pack-budget 2048] [--mix-budgets '{"src0": 1000000}']

Stages (each one atomic commit + lineage row + checkpoint; a killed run
re-submitted with the same --run-id resumes after the last committed
stage): cleaned → eligible → chunks [→ mix] [→ packed], plus the filter
funnel recorded to _metrics so no drop is silent.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default="nightly-0")
    ap.add_argument("--eval-mod", type=int, default=53)
    ap.add_argument("--decontam-n", type=int, default=13)
    ap.add_argument("--boiler-min-df", type=int, default=3)
    ap.add_argument("--size", type=int, default=40)
    ap.add_argument("--overlap", type=int, default=10)
    ap.add_argument("--pack-budget", type=int, default=0)
    ap.add_argument("--mix-budgets", default="")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from augmented_codebase_indexer_spark.operators.chunking import chunk_documents
    from augmented_codebase_indexer_spark.operators.curation_filters import (
        boilerplate_prune,
    )
    from augmented_codebase_indexer_spark.operators.decontam import decontaminate_filter
    from augmented_codebase_indexer_spark.operators.pii import redact_pii
    from augmented_codebase_indexer_spark.operators.sampling import (
        pack_sequences,
        training_mix,
    )
    from augmented_codebase_indexer_spark.operators.textstats import (
        gopher_flag_cols,
        lang_id_col,
        quality_micro_col,
    )
    from augmented_codebase_indexer_spark.plans.curation import V3_GOPHER
    from augmented_codebase_indexer_spark.session import get_spark
    from augmented_codebase_indexer_spark.sources.catalog import Warehouse, run_stage

    spark = get_spark(app_name=f"aci-curate-{args.run_id}")
    wh = Warehouse(args.warehouse, args.run_id)
    docs = spark.read.parquet(args.docs)

    def build_cleaned():
        c = boilerplate_prune(docs, min_df=args.boiler_min_df).filter(
            F.length("clean_text") > 0
        )
        return redact_pii(c, text_col="clean_text", out_col="text").select(
            "doc_id", "text"
        )

    cleaned = run_stage(wh, spark, "cleaned", "cleaned_docs", build_cleaned,
                        bucket_col="doc_id", n_buckets=8)

    def build_eligible():
        ev = cleaned.filter(F.col("doc_id") % args.eval_mod == 0)
        cands = cleaned.filter(F.col("doc_id") % args.eval_mod != 0).filter(
            gopher_flag_cols(F.col("text"), **V3_GOPHER)["passes"]
        )
        kept = decontaminate_filter(cands, ev, n=args.decontam_n)
        return (
            kept.withColumn("quality_micro", quality_micro_col(F.col("text")))
            .filter(lang_id_col(F.col("text")) == "en")
            .select("doc_id", "text", "quality_micro",
                    F.sha2("text", 256).alias("sha"))
        )

    eligible = run_stage(wh, spark, "eligible", "eligible_docs", build_eligible,
                         bucket_col="doc_id", n_buckets=8)

    def build_chunks():
        from pyspark.sql import Window

        w = Window.partitionBy("sha").orderBy(F.asc("doc_id"))
        winners = (
            eligible.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        ch = chunk_documents(winners.select("doc_id", "text"),
                             size=args.size, overlap=args.overlap)
        return ch.join(winners.select("doc_id", "quality_micro"), "doc_id").select(
            "doc_id", "chunk_id", "part_index", "total_parts", "n_tokens",
            "quality_micro",
        )

    chunks = run_stage(wh, spark, "chunks", "cur_chunks", build_chunks,
                       bucket_col="doc_id", n_buckets=8)

    counters = {
        "docs_in": docs.count(),
        "docs_cleaned": cleaned.count(),
        "docs_eligible": eligible.count(),
        "chunks_out": chunks.count(),
    }

    if args.mix_budgets:
        budgets = json.loads(args.mix_budgets)
        src = docs.select("doc_id", "source") if "source" in docs.columns else None
        if src is not None:
            def build_mix():
                toks = eligible.select(
                    "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
                ).join(src, "doc_id")
                return training_mix(toks, budgets)

            mix = run_stage(wh, spark, "mix", "training_mix", build_mix,
                            bucket_col="doc_id", n_buckets=8)
            counters["mix_docs"] = mix.count()

    if args.pack_budget > 0:
        def build_packed():
            return pack_sequences(chunks, budget=args.pack_budget)

        packed = run_stage(wh, spark, "packed", "packed_chunks", build_packed,
                           bucket_col="doc_id", n_buckets=8)
        counters["packed_bins"] = packed.select("shard", "bin_id").distinct().count()

    wh.record_metrics(spark, f"curate:{args.run_id}", counters)
    print(json.dumps(counters))
    spark.stop()


if __name__ == "__main__":
    main()
