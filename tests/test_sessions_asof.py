"""Sessionization and as-of join vs pure-Python oracles."""

import calendar

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.sessions import (
    asof_join,
    session_stats,
    sessionize,
)

SF = "/root/testdata/sf0.001"


def test_sessionize_matches_python(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        (r["event_id"]): (r["user_id"], r["session_seq"])
        for r in sessionize(e, gap_seconds=1800).select(
            "event_id", "user_id", "session_seq").collect()
    }
    rows = sorted(
        [(r["user_id"], calendar.timegm(r["ts"].timetuple()), r["event_id"])
         for r in e.collect()]
    )
    want = {}
    by_user = {}
    for u, ts, eid in rows:
        by_user.setdefault(u, []).append((ts, eid))
    for u, evs in by_user.items():
        evs.sort()
        seq = 0
        prev = None
        for ts, eid in evs:
            if prev is None or ts - prev > 1800:
                seq += 1
            want[eid] = (u, seq)
            prev = ts
    assert got == want


def test_session_stats_shapes(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    s = session_stats(e, gap_seconds=1800).collect()
    assert all(r["n_events"] >= 1 and r["duration_sec"] >= 0 for r in s)
    # sessions per user are contiguous 1..k
    by_user = {}
    for r in s:
        by_user.setdefault(r["user_id"], []).append(r["session_seq"])
    for seqs in by_user.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))


def test_asof_join_matches_bisect(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    dim = e.filter(F.col("event_type") == "signup").select("user_id", "ts", "value")
    evs = e.filter(F.col("event_type") != "signup")
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(evs, dim, key_col="user_id").select(
            "event_id", "asof_value").collect()
    }
    dim_rows = {}
    for r in dim.collect():
        dim_rows.setdefault(r["user_id"], []).append((r["ts"], r["value"]))
    for v in dim_rows.values():
        v.sort()
    want = {}
    for r in evs.collect():
        versions = dim_rows.get(r["user_id"], [])
        # rightmost dim version with ts_version <= event ts
        i = -1
        for j, (vt, _) in enumerate(versions):
            if vt <= r["ts"]:
                i = j
        want[r["event_id"]] = versions[i][1] if i >= 0 else None
    assert got == want


def test_asof_join_no_dim_rows_gives_nulls(spark):
    e = spark.read.parquet(f"{SF}/events.parquet").limit(50)
    empty = e.filter(F.lit(False)).select("user_id", "ts", "value")
    out = asof_join(e, empty, key_col="user_id").collect()
    assert len(out) == 50
    assert all(r["asof_value"] is None for r in out)
