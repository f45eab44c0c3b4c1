"""spark-submit entrypoint for the nightly SCHEMA-QA pass — run the
measure → induce → promote → gate loop over the fact warehouse, as
resumable stages:

    spark-submit --py-files aci_spark.zip jobs/schema_qa.py \
        --facts <parquet (subj, pred, obj)> \
        --types <parquet (entity, type)> \
        --warehouse <output dir> [--run-id schema-0] \
        [--min-share-micro 600000] [--min-typed 3] \
        [--sightings <parquet (class, entity, src)>]

Stages (each one atomic commit + lineage row + checkpoint; a killed run
re-submitted with the same --run-id resumes after the last committed
stage — the contract shared by the curation/temporal/refresh/embedding
jobs):

    profile      — AMIE functionality/cardinality per predicate
                   (the measurement the constraint table cites);
    induced      — SDType domain/range induction with exact micro
                   shares;
    declarations — induced rows promoted where BOTH ends clear the
                   evidence bar (share + typed support);
    violations   — SHACL-lite conformance against the LEARNED
                   declarations;
    published    — facts minus violations (the publishable graph),
                   bucketed by subject for downstream upserts;
    completeness — (optional, when --sightings is given) Chao1
                   class-completeness + Good-Turing unseen mass — the
                   per-class "is another crawl round worth it" signal.

The printed JSON carries the counters a KG operator watches: how many
predicates earned declarations, how much of the graph conforms, and
which classes are still underexplored.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--facts", required=True)
    ap.add_argument("--types", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default="schema-0")
    ap.add_argument("--min-share-micro", type=int, default=600_000)
    ap.add_argument("--min-typed", type=int, default=3)
    ap.add_argument("--sightings", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from augmented_codebase_indexer_spark.operators.kgquality import (
        domain_range_violations,
    )
    from augmented_codebase_indexer_spark.operators.predprofile import (
        predicate_profile,
    )
    from augmented_codebase_indexer_spark.operators.typeinduction import (
        induce_domain_range,
        induced_declarations,
    )
    from augmented_codebase_indexer_spark.session import get_spark
    from augmented_codebase_indexer_spark.sources.catalog import (
        Warehouse,
        run_stage,
    )

    spark = get_spark(app_name=f"aci-schema-{args.run_id}")
    wh = Warehouse(args.warehouse, args.run_id)
    facts = spark.read.parquet(args.facts).select("subj", "pred", "obj")
    types = spark.read.parquet(args.types).select("entity", "type").distinct()

    profile = run_stage(
        wh, spark, "profile", "pred_profile",
        lambda: predicate_profile(facts),
        bucket_col="pred", n_buckets=4,
    )
    induced = run_stage(
        wh, spark, "induced", "induced_schema",
        lambda: induce_domain_range(facts, types),
        bucket_col="pred", n_buckets=4,
    )
    decls = run_stage(
        wh, spark, "declarations", "declarations",
        lambda: induced_declarations(
            induced, args.min_share_micro, args.min_typed),
        bucket_col="pred", n_buckets=4,
    )
    nt = types.select(
        F.col("entity").alias("node_id"), F.col("type").alias("node_type"))
    violations = run_stage(
        wh, spark, "violations", "schema_violations",
        lambda: domain_range_violations(facts, nt, decls),
        bucket_col="pred", n_buckets=4,
    )
    published = run_stage(
        wh, spark, "published", "published_facts",
        lambda: facts.distinct().join(
            violations.select("subj", "pred", "obj"),
            ["subj", "pred", "obj"], "left_anti"),
        bucket_col="subj", n_buckets=8,
    )

    counters = {
        "facts_in": facts.distinct().count(),
        "preds_profiled": profile.count(),
        "preds_declared": decls.count(),
        "violations": violations.count(),
        "published": published.count(),
        "functional_preds": profile.filter("functional_evidence").count(),
    }

    if args.sightings:
        from augmented_codebase_indexer_spark.operators.completeness import (
            class_completeness,
        )

        sightings = spark.read.parquet(args.sightings)
        comp = run_stage(
            wh, spark, "completeness", "class_completeness",
            lambda: class_completeness(sightings),
            bucket_col="class", n_buckets=4,
        )
        counters["classes"] = comp.count()
        counters["min_completeness_micro"] = comp.agg(
            F.coalesce(F.min("completeness_micro"), F.lit(0)).cast("long")
        ).collect()[0][0]

    print(json.dumps(counters))
    spark.stop()


if __name__ == "__main__":
    main()
