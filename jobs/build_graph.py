"""spark-submit entrypoint for the full KG build (north_rule submission path).

    spark-submit --py-files aci_spark.zip jobs/build_graph.py \
        --pages  <parquet path or corpus dir> \
        --gazetteer <parquet path> \
        --warehouse <output dir> \
        --run-id  <resumable run id> \
        [--incremental]   # bring an existing warehouse up to date instead

Packaging: `python jobs/package.py` zips the library for --py-files.
On a killed run, re-submitting with the same --run-id resumes from the
last committed stage checkpoint.
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--gazetteer", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--incremental", action="store_true")
    ap.add_argument("--with-mentions", action="store_true")
    args = ap.parse_args()

    from augmented_codebase_indexer_spark.session import get_spark

    spark = get_spark(app_name=f"aci-build-{args.run_id}")
    pages = spark.read.parquet(args.pages)
    gaz = spark.read.parquet(args.gazetteer)

    if args.incremental:
        from augmented_codebase_indexer_spark.operators.incremental import (
            incremental_update,
        )
        from augmented_codebase_indexer_spark.sources.catalog import Warehouse

        res = incremental_update(
            spark, Warehouse(args.warehouse, args.run_id), pages, gaz
        )
    else:
        from augmented_codebase_indexer_spark.plans.pipeline import build_graph

        res = build_graph(
            spark, pages, gaz, args.warehouse,
            run_id=args.run_id, with_mentions=args.with_mentions,
        )
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
