"""Streaming session windows == batch session windows (modulo the final
watermark: append mode emits a session only once the watermark passes its
end, so a bounded drain yields exactly the sessions that closed before
max_event_time − delay — asserted, not hand-waved)."""

import datetime

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.streaming.sessions import (
    run_stream_sessions,
    session_agg,
)

SF = "/root/testdata/sf0.001"


def test_stream_sessions_match_batch(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sess_in"))
    out = str(tmp_path_factory.mktemp("sess_out"))
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))

    events = spark.read.parquet(f"{SF}/events.parquet")
    events.repartition(6).write.mode("overwrite").parquet(src)

    q = run_stream_sessions(spark, src, out, ckpt, gap="30 minutes", late="1 hour")
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    batch = session_agg(events, "30 minutes").collect()
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=1)
    want_emitted = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in batch if r["session_end"] <= horizon
    }
    assert got == want_emitted
    assert len(got) > 0
    # and the session GROUPING agrees with the window-function sessionize
    from augmented_codebase_indexer_spark.operators.sessions import session_stats

    sess_counts = session_stats(events, gap_seconds=1800).count()
    assert len(batch) == sess_counts
