"""Weekly retention cohorts over an event stream — the standard
product-analytics cohort table (users grouped by first-activity week;
for each later week, the share still active), which doubles as the
crawl-analytics form "of the users/hosts first seen in week W, how many
were seen again k weeks later".

Exactness (the repo's oracle discipline): weeks are INTEGER indices
``datediff(day, epoch) DIV 7`` from a fixed epoch date — not
``date_trunc('week')``, whose week-start convention is an engine
setting — and the retention rate is one truncating BIGINT division
``n_active * 1e6 DIV cohort_size``. Events before the epoch are
filtered out explicitly (trunc-toward-zero ≠ floor for negative day
offsets; the filter makes the DIV a true floor).

Scale shape at 10^12 events: the raw stream collapses to DISTINCT
(user, week) — map-side combined, one exchange of user-week-sized rows;
the cohort assignment is a user-keyed min-agg plus a user-keyed join
(same key, co-partitioned — AQE reuses the exchange); the final cohort
grid is (weeks × offsets)-sized, tiny. No windows, no floats, nothing
driver-side.

Reference anchor: the reference tracks per-watch-cycle update counters
(`src/aci/services/indexing_service.py` metrics) — same
activity-over-time bookkeeping, here per user cohort instead of per
cycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_cohorts(
    events: DataFrame,
    epoch: str = "2024-01-01",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """→ (cohort_week, week_offset, n_active, cohort_size,
    retention_micro): for each first-activity week and each offset ≥ 0,
    how many of the cohort's users were active that week. Offset 0 is
    the cohort itself (retention_micro = 1e6 by construction)."""
    week = (
        F.datediff(F.to_date(F.col(ts_col)), F.to_date(F.lit(epoch)))
    )
    active = (
        events.select(
            F.col(user_col).alias("user_id"), week.alias("day_off")
        )
        .filter(F.col("day_off") >= 0)
        .select("user_id", F.expr("CAST(day_off DIV 7 AS BIGINT)").alias("week"))
        .distinct()
    )
    first = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    grid = (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    size = first.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    return grid.join(size, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.expr("n_active * 1000000 DIV cohort_size").alias("retention_micro"),
    )


def retention_cohorts_oracle_sql(
    events_sql: str = "SELECT user_id, ts FROM events",
    epoch: str = "2024-01-01",
) -> str:
    """DuckDB mirror: same integer week grid, same trunc division."""
    return f"""
    WITH active AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '{epoch}', CAST(ts AS DATE)) // 7 AS week
      FROM ({events_sql})
      WHERE datediff('day', DATE '{epoch}', CAST(ts AS DATE)) >= 0),
    first AS (
      SELECT user_id, min(week) AS cohort_week FROM active GROUP BY user_id),
    grid AS (
      SELECT cohort_week, week - cohort_week AS week_offset,
             CAST(count(*) AS BIGINT) AS n_active
      FROM active JOIN first USING (user_id)
      GROUP BY cohort_week, week - cohort_week),
    sz AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
      FROM first GROUP BY cohort_week)
    SELECT cohort_week, week_offset, n_active, cohort_size,
           n_active * 1000000 // cohort_size AS retention_micro
    FROM grid JOIN sz USING (cohort_week)
    """
