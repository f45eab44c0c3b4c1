"""Ordered funnel analysis over an event stream — the classic product
query ("of the users who signed up, how many then clicked, then
purchased — in that order?"), in its deterministic earliest-completion
form: step k's time is the EARLIEST event of step k's type strictly
after the user's step-(k−1) time. Greedy-earliest is the standard
strict-order funnel semantics and is a pure function of the event set
(no window ordering over ties — min() decides).

The KG-pipeline reading: crawl lifecycle funnels (discovered → fetched
→ extracted → published) over per-url event logs — same operator, urls
for users.

Exactness: timestamps gate as BIGINT epoch seconds; absent steps are
NULL; users with no step-1 event are absent (sparse convention).

Scale shape: one filtered min-groupBy per step (map-side combined over
only that step's events) + one user-keyed equi-join per step — k steps
= k slim co-keyed joins, no windows, no self-join of the raw stream.
An optional ``horizon_s`` caps completion at step-1 time + horizon
(the "within 7 days" form) as a plain integer predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_analysis(
    events: DataFrame,
    steps: list[str],
    horizon_s: int | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """→ (user_id, steps_done, t_step1, t_done): per user entering the
    funnel (≥1 step-1 event), how deep they got under strict ordering,
    when they entered, and when they completed (NULL unless all steps).
    ``horizon_s`` restricts later steps to within that many seconds of
    t_step1."""
    if len(steps) < 2:
        raise ValueError("funnel_analysis: need at least 2 steps")
    # NTZ-proof epoch seconds: parquet TIMESTAMP_NTZ won't cast straight
    # to BIGINT; via TIMESTAMP it does, and the session tz is pinned UTC
    # (session.py) so the value matches DuckDB's epoch()
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).cast("timestamp").cast("long").alias("ts"),
    )
    cur = (
        ev.filter(F.col("etype") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    prev_t = "t1"
    for k, step in enumerate(steps[1:], start=2):
        nxt = ev.filter(F.col("etype") == step).select(
            F.col("user_id").alias("_uid"), F.col("ts").alias("_ts")
        )
        # the step predicate lives IN the left join (not a post-filter):
        # a user whose candidate events all arrive too early must keep
        # their row with a NULL step time, not vanish
        cond = (F.col("user_id") == F.col("_uid")) & (
            F.col("_ts") > F.col(prev_t)
        )
        if horizon_s is not None:
            cond = cond & (F.col("_ts") <= F.col("t1") + F.lit(horizon_s))
        carried = [c for c in cur.columns if c != "user_id"]
        cur = (
            cur.join(nxt, cond, "left")
            .groupBy("user_id")
            .agg(
                *[F.min(c).alias(c) for c in carried],
                F.min("_ts").alias(f"t{k}"),
            )
        )
        prev_t = f"t{k}"
    n = len(steps)
    done_expr = "CASE " + " ".join(
        f"WHEN t{k} IS NOT NULL THEN {k}" for k in range(n, 1, -1)
    ) + " ELSE 1 END"
    return cur.selectExpr(
        "user_id",
        f"CAST({done_expr} AS BIGINT) AS steps_done",
        "t1 AS t_step1",
        f"t{n} AS t_done",
    )


def funnel_oracle_sql(
    events_sql: str,
    steps: list[str],
    horizon_s: int | None = None,
) -> str:
    """DuckDB mirror: the same per-step earliest-after chain. Expects a
    TIMESTAMP ts column (epoch() = Spark's timestamp→long cast)."""
    parts = [
        f"""WITH ev AS (
      SELECT user_id, event_type AS etype,
             -- floor, not bare CAST: epoch() is a DOUBLE with fractional
             -- seconds and DuckDB's double→BIGINT cast ROUNDS, while
             -- Spark's timestamp→long cast floors
             CAST(floor(epoch(ts)) AS BIGINT) AS ts
      FROM ({events_sql})),
    s1 AS (
      SELECT user_id, CAST(min(ts) AS BIGINT) AS t1
      FROM ev WHERE etype = '{steps[0]}' GROUP BY user_id)"""
    ]
    prev, prev_t = "s1", "t1"
    for k, step in enumerate(steps[1:], start=2):
        hz = (f" AND n.ts <= p.t1 + {horizon_s}"
              if horizon_s is not None else "")
        carried = ", ".join(f"p.t{j}" for j in range(1, k))
        parts.append(
            f"""s{k} AS (
      SELECT {carried}, p.user_id,
             CAST(min(n.ts) AS BIGINT) AS t{k}
      FROM {prev} p LEFT JOIN ev n
        ON n.user_id = p.user_id AND n.etype = '{step}'
        AND n.ts > p.{prev_t}{hz}
      GROUP BY p.user_id, {carried})"""
        )
        prev, prev_t = f"s{k}", f"t{k}"
    n = len(steps)
    done = "CASE " + " ".join(
        f"WHEN t{k} IS NOT NULL THEN {k}" for k in range(n, 1, -1)
    ) + " ELSE 1 END"
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT user_id, CAST({done} AS BIGINT) AS steps_done,
           t1 AS t_step1, t{n} AS t_done
    FROM s{n}
    """
    )
