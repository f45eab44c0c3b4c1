"""Focused per-query benchmark + plan capture for optimization work.

``bench.py`` is FROZEN for measurement; this helper reproduces its per-query
methodology (same session conf via ``_spark``-equivalent settings, noop sink,
best-of-2 walls) on an arbitrary subset of queries so an optimization can be
A/B'd in isolation without re-running the full 25-minute sweep.

Usage::

    python bench_extra.py time  q1 q2 ...     # best-of-2 noop walls, JSON line
    python bench_extra.py plan  q1 q2 ...     # explain("formatted") -> plans/r07/<q>_<tag>.txt
    ACI_PLAN_TAG=after python bench_extra.py plan q1

Environment: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32), ``ACI_BENCH_PASSES`` (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PASSES = int(os.environ.get("ACI_BENCH_PASSES", "2"))
TAG = os.environ.get("ACI_PLAN_TAG", "before")


def _spark():
    from augmented_codebase_indexer_spark.session import get_spark

    # mirror bench.py::_spark exactly so walls are comparable
    return get_spark(
        app_name=f"aci-bench-extra-{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": "0",
        },
    )


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:]
    spark = _spark()
    import __spark_entry__ as em

    qs = em.queries()
    if not names:
        names = list(qs)

    if mode == "plan":
        os.makedirs("plans/r07", exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            path = f"plans/r07/{name}_{TAG}.txt"
            with open(path, "w") as f:
                f.write(formatted(df))
            print(f"wrote {path}")
        spark.stop()
        return

    walls = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        ws = []
        for _ in range(PASSES):
            t = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ws.append(time.monotonic() - t)
        walls[name] = round(min(ws), 3)
        print(f"  {name}: {walls[name]} s  (passes: {[round(w, 3) for w in ws]})",
              file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "queries": walls}))


if __name__ == "__main__":
    main()
