"""First-order event-transition (Markov) matrix over a user event
stream: for each ordered pair of consecutive events BY THE SAME USER,
the transition count and the row-normalized transition probability.
The classic clickstream model (and the navigation prior a crawler's
politeness/scheduling layer uses: after `view`, how often `purchase`
vs `error`).

Exactness: counts are BIGINT; the probability is one truncating
division ``n * 1e6 DIV n_from``. Consecutiveness is a lead() window
ordered by (ts, event_id) — the event-id tiebreak makes the sequence
deterministic on both engines even under equal timestamps.

Scale shape at 10^12 events: ONE shuffle partitioned by user_id (window
state is a single previous row, streaming-friendly; per-user partitions
are bounded by per-user activity, never by corpus size), then the pair
relation collapses map-side into the (from, to) vocabulary — at most
|event_type|² rows cross the second exchange. The row-margin join is a
vocabulary-sized broadcast.

Reference anchor: the reference's watch pipeline debounces consecutive
filesystem events per path (`src/aci/core/debouncer.py:31`) — the same
per-key consecutive-pair structure, aggregated here instead of
suppressed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """→ (from_type, to_type, n, n_from, p_micro): consecutive
    same-user transition counts and the truncated row-stochastic
    probability (Σ_to p ≈ 1e6 per from_type, up to truncation)."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    margins = pairs.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    return pairs.join(F.broadcast(margins), "from_type").select(
        "from_type",
        "to_type",
        "n",
        "n_from",
        F.expr("n * 1000000 DIV n_from").alias("p_micro"),
    )


def event_transitions_oracle_sql(
    events_sql: str = "SELECT event_id, user_id, event_type, ts FROM events",
) -> str:
    """DuckDB mirror: same window order, same trunc division."""
    return f"""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ) AS to_type
      FROM ({events_sql})),
    pairs AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
    margins AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
      FROM pairs GROUP BY from_type)
    SELECT from_type, to_type, n, n_from, n * 1000000 // n_from AS p_micro
    FROM pairs JOIN margins USING (from_type)
    """
