"""spark-submit entrypoint for the nightly GRAPH-EMBEDDING training
corpus — the DeepWalk/TransE data chain over the linked KG, as
resumable warehouse stages:

    spark-submit --py-files aci_spark.zip jobs/embedding_corpus.py \
        --pages <pages parquet> --gazetteer <gazetteer parquet> \
        --warehouse <output dir> [--run-id emb-0] [--walk-len 4] \
        [--walks-per-node 2] [--window 2] [--neg-k 2] [--seed w0]

Stages (each one atomic commit + lineage row + checkpoint; a killed run
re-submitted with the same --run-id resumes after the last committed
stage — and because walks and negatives are md5-hash-chosen, a RESTART
REGENERATES BIT-IDENTICAL DATA, so a resumed corpus is indistinguishable
from an uninterrupted one):

    kg_edges    — distinct resolved (src, dst) entity edges, bucketed
                  by src so the walk joins prune;
    walks       — deterministic random-walk corpus (hash-chosen hops);
    sg_pairs    — skip-gram (center, context, n) co-occurrence counts,
                  bucketed by center (the SGNS/PMI input);
    kg_negatives— filtered type-consistent corrupted triples (TransE
                  protocol), bucketed by subj.

The printed JSON carries the stage counters.
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
    ap.add_argument("--run-id", default="emb-0")
    ap.add_argument("--walk-len", type=int, default=4)
    ap.add_argument("--walks-per-node", type=int, default=2)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--neg-k", type=int, default=2)
    ap.add_argument("--seed", default="w0")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from augmented_codebase_indexer_spark.config import PipelineConfig
    from augmented_codebase_indexer_spark.operators.extraction import extract_stage
    from augmented_codebase_indexer_spark.operators.negatives import (
        negative_samples,
    )
    from augmented_codebase_indexer_spark.operators.walks import (
        deterministic_walks,
        skipgram_pairs,
    )
    from augmented_codebase_indexer_spark.plans.pipeline import linker_stages
    from augmented_codebase_indexer_spark.session import get_spark
    from augmented_codebase_indexer_spark.sources.catalog import Warehouse, run_stage

    spark = get_spark(app_name=f"aci-embed-{args.run_id}")
    wh = Warehouse(args.warehouse, args.run_id)
    pages = spark.read.parquet(args.pages)
    gaz = spark.read.parquet(args.gazetteer)
    cfg = PipelineConfig()
    _, triple_fn, link_fn = linker_stages(spark, gaz, cfg)

    def build_kg():
        extracted = extract_stage(pages).filter(
            F.col("lang").isin(*cfg.allowed_langs)
            & (F.length("extracted_text") > 0)
        )
        return (
            link_fn(triple_fn(extracted))
            .filter(F.col("resolved"))
            .select("subj_id", "pred", "obj_id")
            .distinct()
        )

    triples = run_stage(wh, spark, "kg_triples", "emb_triples", build_kg,
                        bucket_col="subj_id", n_buckets=8)
    edges = run_stage(
        wh, spark, "kg_edges", "emb_edges",
        lambda: triples.select(
            F.col("subj_id").alias("src"), F.col("obj_id").alias("dst")
        ).distinct(),
        bucket_col="src", n_buckets=8,
    )
    walks = run_stage(
        wh, spark, "walks", "emb_walks",
        lambda: deterministic_walks(
            edges, walk_len=args.walk_len,
            walks_per_node=args.walks_per_node, seed=args.seed,
        ),
        bucket_col="start_node", n_buckets=8,
    )
    pairs = run_stage(
        wh, spark, "sg_pairs", "emb_pairs",
        lambda: skipgram_pairs(walks, window=args.window),
        bucket_col="center", n_buckets=8,
    )
    negs = run_stage(
        wh, spark, "kg_negatives", "emb_negatives",
        lambda: negative_samples(
            triples.select(
                F.col("subj_id").alias("subj"), "pred",
                F.col("obj_id").alias("obj"),
            ),
            k=args.neg_k, seed=args.seed,
        ),
        bucket_col="subj", n_buckets=8,
    )

    counters = {
        "triples": triples.count(),
        "edges": edges.count(),
        "nodes": edges.select("src").union(edges.select("dst"))
                      .distinct().count(),
        "walk_rows": walks.count(),
        "pairs": pairs.count(),
        "pair_occurrences": pairs.agg(F.sum("n")).collect()[0][0],
        "negatives": negs.count(),
    }
    print(json.dumps(counters))
    spark.stop()


if __name__ == "__main__":
    main()
