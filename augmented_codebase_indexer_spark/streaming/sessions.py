"""Streaming sessionization — native session windows with late-data handling.

The batch operator (``operators/sessions.py::sessionize``) assigns sessions
with window functions; on an unbounded stream the same semantics come from
Structured Streaming's built-in session windows:

    readStream → withWatermark(ts, late) → groupBy(session_window(ts, gap),
    user_id) → agg → append

State handling is Spark's: the session store merges events whose gap is
below ``gap``; the watermark bounds how long an open session waits for
late events before it finalizes and emits (append mode emits CLOSED
sessions only — exactly once per session). This is the managed-state
counterpart of our ``applyInPandasWithState`` custom operator
(``streaming/stateful.py``): use session_window when the state shape IS
sessions; drop to applyInPandasWithState for bespoke state machines.

Equivalence contract (tested): draining a bounded input with availableNow
produces the same per-session aggregates as the batch groupBy on the same
DataFrame expression — and the same session COUNTS as the window-function
``sessionize`` (the two formulations define identical groupings except on
gaps equal to the boundary to the microsecond).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def session_agg(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """The SAME expression serves batch df and streaming df (Spark decides
    the physical session-state operator by input type)."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def run_stream_sessions(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    late: str = "1 hour",
):
    """Drain ``input_dir`` (availableNow) into per-session rows at
    ``out_dir``; exactly-once via the checkpoint."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
        .withWatermark("ts", late)
    )
    return (
        session_agg(stream, gap)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
