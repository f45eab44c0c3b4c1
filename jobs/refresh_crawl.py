"""spark-submit entrypoint for the nightly CRAWL-REFRESH planner — turn
sitemaps + the fetch log + robots policies into tomorrow's fetch queue,
as resumable warehouse stages:

    spark-submit --py-files aci_spark.zip jobs/refresh_crawl.py \
        --sitemaps <parquet (domain, xml)> \
        --robots <parquet (domain, robots_txt)> \
        --fetch-log <parquet (url, fetched_at)> \
        --warehouse <output dir> [--run-id refresh-0] \
        [--agent aci-bot] [--per-host-cap 1000]

Stages (each one atomic commit + lineage row + checkpoint; a killed run
re-submitted with the same --run-id resumes after the last committed
stage — the same contract as the curation and temporal jobs):

    entries  — sitemap urls + lastmod epochs (codegen parse);
    recrawl  — changed-since selection against the fetch log
               (new / modified verdicts);
    queue    — the politeness frontier over the recrawl candidates:
               canonical-form dedup, robots gate, per-host quota +
               fetch slots; bucketed by host so per-host drains prune;
    budget   — Hamilton largest-remainder apportionment of --budget
               fetch slots across the queued hosts (integer allocs
               that sum EXACTLY to the budget; operators/budget.py) —
               the number a rate-limited fetch fleet actually consumes.

The printed JSON carries the stage counters a crawl operator watches:
how much of the corpus moved, and how much of tomorrow's budget it
fills.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sitemaps", required=True)
    ap.add_argument("--robots", required=True)
    ap.add_argument("--fetch-log", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default="refresh-0")
    ap.add_argument("--agent", default="aci-bot")
    ap.add_argument("--per-host-cap", type=int, default=1000)
    ap.add_argument("--budget", type=int, default=10000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from augmented_codebase_indexer_spark.operators.frontier import crawl_frontier
    from augmented_codebase_indexer_spark.operators.robots import parse_robots
    from augmented_codebase_indexer_spark.operators.sitemaps import (
        parse_sitemap,
        recrawl_candidates,
    )
    from augmented_codebase_indexer_spark.session import get_spark
    from augmented_codebase_indexer_spark.sources.catalog import Warehouse, run_stage

    spark = get_spark(app_name=f"aci-refresh-{args.run_id}")
    wh = Warehouse(args.warehouse, args.run_id)
    sitemaps = spark.read.parquet(args.sitemaps)
    robots = spark.read.parquet(args.robots)
    fetch_log = spark.read.parquet(args.fetch_log)

    entries = run_stage(
        wh, spark, "entries", "sitemap_entries",
        lambda: parse_sitemap(sitemaps),
        bucket_col="loc", n_buckets=8,
    )
    recrawl = run_stage(
        wh, spark, "recrawl", "recrawl_candidates",
        lambda: recrawl_candidates(entries, fetch_log),
        bucket_col="url", n_buckets=8,
    )
    queue = run_stage(
        wh, spark, "queue", "fetch_queue",
        lambda: crawl_frontier(
            recrawl, parse_robots(robots),
            agent=args.agent, per_host_cap=args.per_host_cap,
        ),
        bucket_col="host", n_buckets=8,
    )

    from augmented_codebase_indexer_spark.operators.budget import crawl_budget

    alloc = run_stage(
        wh, spark, "budget", "host_budget",
        lambda: crawl_budget(
            queue.groupBy("host").agg(
                F.count("*").cast("long").alias("n_pages")),
            budget=args.budget,
        ),
        bucket_col="host", n_buckets=8,
    )

    counters = {
        "sitemap_entries": entries.count(),
        "recrawl_new": recrawl.filter(F.col("reason") == "new").count(),
        "recrawl_modified": recrawl.filter(F.col("reason") == "modified").count(),
        "queued": queue.count(),
        "hosts": queue.select("host").distinct().count(),
        "budget_allocated": alloc.agg(
            F.coalesce(F.sum("alloc"), F.lit(0)).cast("long")
        ).collect()[0][0],
    }
    print(json.dumps(counters))
    spark.stop()


if __name__ == "__main__":
    main()
