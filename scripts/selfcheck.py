"""Mimic the driver's correctness gate: run every queries() entry at sf0.01
on Spark AND its oracle_sql() on DuckDB, compare row count, column names,
and an order-insensitive value multiset. Usage:

    python scripts/selfcheck.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod
from augmented_codebase_indexer_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_val(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="selfcheck", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    ok = bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            bad += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(rows)} rows, {wall:.1f}s")
            ok += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            bad += 1
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema {sorted(cols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if not problems:
            a = frame_multiset(cols, rows)
            b = frame_multiset(ocols, orows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            print(f"FAIL {name} ({wall:.1f}s): " + "; ".join(problems))
            bad += 1
        else:
            print(f"OK   {name}: {len(rows)} rows, {wall:.1f}s")
            ok += 1
    print(f"\n{ok} ok, {bad} fail")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
