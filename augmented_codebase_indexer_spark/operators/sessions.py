"""Sessionization and as-of joins over event streams.

Two operators every web-scale event pipeline needs that the reference's
single-node design never had to express distributedly:

* ``sessionize`` — gap-based session assignment: a new session starts when
  the same user's inter-event gap exceeds ``gap_seconds``. Expressed as the
  classic two-window composition (lag → boundary flag → running sum), which
  Catalyst executes as ONE shuffle on user_id (both windows share the
  partitioning; the second sort is avoided because the frames share
  ordering). Skew note: a pathological single user serializes into one
  task — the same bound as any per-key ordered computation; cap with an
  upstream per-user limit if a key can exceed task memory.

* ``asof_join`` — each event joined to the most recent dimension version
  with ``dim.ts <= event.ts`` (price-as-of-trade, config-as-of-request).
  Expressed without a range join: union the two tagged row sets, one
  window over (key, ts) carries the last dimension value forward
  (``F.last(ignorenulls=True)``), then keep event rows. ONE shuffle on the
  key — versus the naive inequality join which Spark would execute as a
  broadcast-nested-loop (quadratic per key). This is the standard
  union-window as-of pattern used by time-series engines.

Both are pure window algebra — no UDFs — and both have exact DuckDB
mirrors (DuckDB even has native ASOF JOIN, which makes the as-of oracle a
genuinely independent implementation, not an echo of ours).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """→ events + (session_seq, session_id). session_seq numbers a user's
    sessions from 1 in time order; session_id = sha2(user:first_seq) is the
    deterministic global id. Ties on ts break by event_id where present."""
    def _epoch(c):
        # TIMESTAMP_NTZ refuses a direct long cast; route through session-TZ
        # timestamp (session is pinned UTC) — truncates to whole seconds,
        # mirrored by floor(epoch(ts)) in the DuckDB oracle
        return c.cast("timestamp").cast("long")

    order = [F.asc(ts_col)] + ([F.asc("event_id")] if "event_id" in events.columns else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (_epoch(F.col(ts_col)) - _epoch(prev_ts) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    out = events.withColumn("__new", new_session).withColumn(
        "session_seq",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return out.drop("__new").withColumn(
        "session_id",
        F.sha2(
            F.concat_ws(":", F.col(user_col).cast("string"),
                        F.col("session_seq").cast("string")),
            256,
        ),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup: event count, duration, value sum. The groupBy
    reuses the sessionize shuffle's partitioning (same leading key)."""
    s = sessionize(events, gap_seconds, user_col, ts_col)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(F.col(ts_col).cast("timestamp").cast("long"))
             - F.min(F.col(ts_col).cast("timestamp").cast("long")))
            .alias("duration_sec"),
            F.round(F.sum(value_col), 4).alias("total_value"),
        )
    )


def asof_join(
    events: DataFrame,
    dim: DataFrame,
    key_col: str,
    events_ts: str = "ts",
    dim_ts: str = "ts",
    dim_value: str = "value",
    dim_tiebreak: str | None = None,
) -> DataFrame:
    """events + latest ``dim_value`` as-of each event's timestamp (NULL when
    no dimension version precedes it). Dimension rows sort BEFORE event
    rows on ts ties (an update effective at t applies to events at t).
    Among DIMENSION rows sharing the same (key, ts), the carried value is
    made deterministic by a final sort key: ``dim_tiebreak`` (a dim column,
    e.g. a version/sequence id — the greatest wins) when given, else the
    value itself (ADVICE r2: without this the pick was partition-order
    dependent and could diverge from the DuckDB ASOF oracle)."""
    e = events.withColumn("__src", F.lit(1)).withColumn("__dimval", F.lit(None).cast(
        dim.schema[dim_value].dataType
    ))
    tiebreak_src = F.col(dim_tiebreak) if dim_tiebreak else F.col(dim_value)
    d = (
        dim.select(
            F.col(key_col),
            F.col(dim_ts).alias(events_ts),
            F.col(dim_value).alias("__dimval"),
            tiebreak_src.alias("__tie"),
        )
        .withColumn("__src", F.lit(0))
    )
    e = e.withColumn("__tie", F.lit(None).cast(d.schema["__tie"].dataType))
    cols = [key_col, events_ts, "__src", "__dimval", "__tie"]
    extra = [c for c in events.columns if c not in (key_col, events_ts)]
    merged = e.select(*cols, *extra).unionByName(
        d.select(*cols, *[F.lit(None).cast(e.schema[c].dataType).alias(c) for c in extra])
    )
    # event rows (__src=1) sort after all same-ts dim rows; among same-ts dim
    # rows the LAST in (__tie asc) order wins the carry — deterministic
    w = Window.partitionBy(key_col).orderBy(
        F.asc(events_ts), F.asc("__src"), F.asc_nulls_first("__tie")
    ).rowsBetween(Window.unboundedPreceding, 0)
    carried = merged.withColumn("asof_value", F.last("__dimval", ignorenulls=True).over(w))
    return carried.filter(F.col("__src") == 1).drop("__src", "__dimval", "__tie")
