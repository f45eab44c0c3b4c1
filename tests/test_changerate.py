"""Change-rate estimation (operators/changerate.py): hand-built visit
histories vs the ln_micro_py mirror, estimator boundary cases,
duplicate-observation collapse, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py
from augmented_codebase_indexer_spark.operators.changerate import (
    change_rates,
    change_rates_oracle_sql,
)

MICRO = 1_000_000

LOG = [
    # u1: 5 visits over 400s, hashes a a b b c → 2 changes of 4
    ("u1", 0, "a"), ("u1", 100, "a"), ("u1", 200, "b"),
    ("u1", 300, "b"), ("u1", 400, "c"),
    # u2: never changes
    ("u2", 0, "x"), ("u2", 50, "x"), ("u2", 100, "x"),
    # u3: changes every visit → estimator diverges
    ("u3", 0, "p"), ("u3", 10, "q"), ("u3", 20, "r"),
    # u4: single visit → no information
    ("u4", 7, "z"),
    # u5: duplicate (url, epoch) rows collapse first
    ("u5", 0, "m"), ("u5", 0, "m"), ("u5", 60, "n"), ("u5", 120, "n"),
]


def _df(spark):
    return spark.createDataFrame(
        LOG, "url string, fetch_epoch long, content_hash string")


def test_estimator(spark):
    rows = {r["url"]: r for r in change_rates(_df(spark)).collect()}
    u1 = rows["u1"]
    assert u1["n_intervals"] == 4 and u1["n_changes"] == 2
    assert u1["avg_interval_sec"] == 100
    assert u1["rate_micro"] == ln_micro_py(4, 2)   # ln(4/2) = ln 2
    assert u1["revisit_sec"] == 100 * MICRO // ln_micro_py(4, 2)
    u2 = rows["u2"]
    assert u2["rate_micro"] == 0 and u2["revisit_sec"] is None
    assert u2["always_changed"] is False
    u3 = rows["u3"]
    assert u3["rate_micro"] is None and u3["always_changed"] is True
    u4 = rows["u4"]
    assert u4["n_intervals"] == 0 and u4["rate_micro"] is None
    u5 = rows["u5"]
    assert u5["n_intervals"] == 2 and u5["n_changes"] == 1


def test_matches_duckdb_oracle(spark):
    l_sql = " UNION ALL ".join(
        f"SELECT '{u}' AS url, {t} AS fetch_epoch, '{h}' AS content_hash"
        for u, t, h in LOG)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(change_rates_oracle_sql(l_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in change_rates(_df(spark)).collect())
    assert got == want and len(got) == 5
