"""Daily burst detection over an event stream — the ratio-test form of
bursty-topic detection (the batch two-state reduction of Kleinberg
KDD'02: a day is bursting when its rate exceeds the series' base rate
by a factor; the full HMM adds hysteresis, the ratio test is the
industry-standard trending screen). Trending entities/predicates are a
first-class web-KG signal: which subjects spiked this crawl?

Exactness: the burst verdict is the INTEGER cross-multiplication

    n_day · n_days · den  >  n_total · num          (factor = num/den)

— no rates, no floats; ``ratio_micro = (n_day · n_days · 1e6) DIV
n_total`` is the displayed intensity (one truncating division). The
day grid is the series' own distinct days (a type absent on a day
counts 0 implicitly in the mean via n_total / n_days; absent days are
not emitted — the standard sparse convention).

Scale shape: one (key, day) groupBy (map-side combined — the raw event
stream collapses per partition before the exchange), one key-total
groupBy over the already-aggregated day rows, one 1-row day-count frame
broadcast by crossJoin. No windows, no self-joins: 10^12 events cost
one combiner pass + two slim shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_bursts(
    events: DataFrame,
    factor: tuple[int, int] = (6, 5),
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """→ (event_type, day, n_day, n_total, n_days, ratio_micro,
    is_burst): per key and day, the count, the key's series totals, the
    intensity vs the key's mean daily rate, and the cross-multiplied
    burst verdict at ``factor`` = (num, den)."""
    num, den = factor
    if num <= 0 or den <= 0:
        raise ValueError("daily_bursts: factor must be positive")
    day = events.select(
        F.col(key_col).alias("event_type"),
        F.to_date(F.col(ts_col)).alias("day"),
    )
    per_day = day.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("n_day")
    )
    totals = per_day.groupBy("event_type").agg(
        F.sum("n_day").cast("long").alias("n_total")
    )
    n_days = day.select("day").distinct().agg(
        F.count("*").cast("long").alias("n_days")
    )
    return (
        per_day.join(totals, "event_type")
        .crossJoin(F.broadcast(n_days))
        .selectExpr(
            "event_type", "day", "n_day", "n_total", "n_days",
            "(n_day * n_days * 1000000) DIV n_total AS ratio_micro",
            f"n_day * n_days * {den} > n_total * {num} AS is_burst",
        )
    )


def daily_bursts_oracle_sql(
    events_sql: str = "SELECT event_type, ts FROM events",
    factor: tuple[int, int] = (6, 5),
) -> str:
    """DuckDB mirror: same grouping, same integer cross-multiply."""
    num, den = factor
    return f"""
    WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day
               FROM ({events_sql})),
    per_day AS (
      SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_day
      FROM e GROUP BY event_type, day),
    totals AS (
      SELECT event_type, CAST(sum(n_day) AS BIGINT) AS n_total
      FROM per_day GROUP BY event_type),
    nd AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS n_days FROM e)
    SELECT event_type, day, n_day, n_total, n_days,
           (n_day * n_days * 1000000) // n_total AS ratio_micro,
           n_day * n_days * {den} > n_total * {num} AS is_burst
    FROM per_day JOIN totals USING (event_type) CROSS JOIN nd
    """
