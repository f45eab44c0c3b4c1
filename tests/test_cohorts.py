"""Retention cohorts (operators/cohorts.py): hand-computed grid on a
planted fixture, pre-epoch filter, trunc-division exactness, DuckDB
parity."""

from datetime import datetime

import duckdb

from augmented_codebase_indexer_spark.operators.cohorts import (
    retention_cohorts,
    retention_cohorts_oracle_sql,
)

# epoch 2024-01-01 (Mon). Week 0 = Jan 1-7, week 1 = Jan 8-14, ...
# u1: weeks 0, 1, 2      (cohort 0, retained at +1, +2)
# u2: weeks 0, 2         (cohort 0, retained at +2 only)
# u3: week 0 only        (cohort 0, never retained)
# u4: weeks 1, 2         (cohort 1, retained at +1)
# u5: pre-epoch only     (filtered out entirely)
EVENTS = [
    (1, datetime(2024, 1, 2, 9)), (1, datetime(2024, 1, 9, 9)),
    (1, datetime(2024, 1, 16, 9)), (1, datetime(2024, 1, 3, 12)),
    (2, datetime(2024, 1, 1, 0)), (2, datetime(2024, 1, 21, 23)),
    (3, datetime(2024, 1, 7, 23, 59)),
    (4, datetime(2024, 1, 8, 0)), (4, datetime(2024, 1, 15, 1)),
    (5, datetime(2023, 12, 31, 23)),
]


def _df(spark):
    return spark.createDataFrame(EVENTS, "user_id long, ts timestamp")


def test_planted_grid(spark):
    rows = {
        (r["cohort_week"], r["week_offset"]): r
        for r in retention_cohorts(_df(spark)).collect()
    }
    # cohort 0: 3 users; offsets 0 (3), 1 (u1), 2 (u1, u2)
    assert rows[(0, 0)]["n_active"] == 3
    assert rows[(0, 0)]["cohort_size"] == 3
    assert rows[(0, 0)]["retention_micro"] == 1_000_000
    assert rows[(0, 1)]["n_active"] == 1
    assert rows[(0, 1)]["retention_micro"] == 333_333  # 1e6 // 3 truncates
    assert rows[(0, 2)]["n_active"] == 2
    assert rows[(0, 2)]["retention_micro"] == 666_666
    # cohort 1: u4 only
    assert rows[(1, 0)]["cohort_size"] == 1
    assert rows[(1, 1)]["n_active"] == 1
    # u5 (pre-epoch) contributes nothing; no negative cohorts
    assert all(cw >= 0 for cw, _ in rows)
    assert len(rows) == 5


def test_distinct_within_week(spark):
    # u1 has two week-0 events → still counts once
    rows = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in retention_cohorts(_df(spark)).collect()
    }
    assert rows[(0, 0)] == 3


def test_matches_duckdb_oracle(spark):
    events_sql = " UNION ALL ".join(
        f"SELECT {u} AS user_id, TIMESTAMP '{ts}' AS ts" for u, ts in EVENTS
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(retention_cohorts_oracle_sql(events_sql))
        .fetchall()
    )
    got = sorted(tuple(r) for r in retention_cohorts(_df(spark)).collect())
    assert got == want and len(got) == 5
