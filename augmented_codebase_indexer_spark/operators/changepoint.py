"""CUSUM changepoint detection — Page's cumulative-sum control chart
over per-series daily counts, in exact integer micro units.

The sequential level-shift detector (Page, Biometrika 1954; the
control-chart complement to the ratio-test burst screen in
`operators/bursts.py`: bursts catch one-day spikes, CUSUM accumulates
SMALL persistent shifts — a crawler that quietly started returning 20%
more errors every day trips CUSUM long before any single day looks
anomalous). The textbook recursion

    S_t = max(0, S_{t-1} + (x_t − μ − k))

looks sequential, but equals ``P_t − min(0, min_{j≤t} P_j)`` for the
drift-adjusted prefix sums ``P_t = Σ_{i≤t} (x_i − μ − k)`` — two
window functions (running sum + running min), both partitioned by
series and exact in BIGINT micro units. One-sided (upward shifts);
run the negated series for drops. ``μ`` is either caller-supplied
(baseline regime) or the series' truncating mean — computed-over-all
weakens but does not break detection for large shifts (documented).

Alarm when ``S_t ≥ h``; ``k`` is the allowance (half the shift you
want to detect, in the classic tuning).

Scale shape: one (series) aggregate for μ (map-side combined), one
partitioned window pass ordered by day — no unpartitioned window, no
float, no UDF. Series count × days is the frame size.

Reference anchor: the reference alerts on indexing-rate regressions
between runs (`core/indexer` metrics); this is the sequential form
that needs no fixed comparison window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def cusum_alarms(
    daily: DataFrame,
    k_micro: int = 0,
    h_micro: int = 20 * MICRO,
    mu_micro: int | None = None,
    series_col: str = "series",
    day_col: str = "day",
    cnt_col: str = "cnt",
) -> DataFrame:
    """daily(series, day, cnt) → (series, day, cnt, cusum_micro,
    alarm); one row per input row, ordered state exact."""
    d = daily.select(
        F.col(series_col).alias("series"),
        F.col(day_col).cast("long").alias("day"),
        F.col(cnt_col).cast("long").alias("cnt"),
    )
    if mu_micro is None:
        mu = d.groupBy("series").agg(
            (F.sum("cnt") * MICRO).cast("long").alias("_s"),
            F.count("*").cast("long").alias("_n"),
        ).selectExpr("series", "_s DIV _n AS mu_micro")
        d = d.join(mu, "series")
    else:
        d = d.withColumn("mu_micro", F.lit(mu_micro).cast("long"))
    w = Window.partitionBy("series").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    d = d.withColumn(
        "_p",
        F.sum(F.expr(f"cnt * {MICRO} - mu_micro - {k_micro}")).over(w)
        .cast("long"),
    ).withColumn("_m", F.min("_p").over(w).cast("long"))
    return d.selectExpr(
        "series", "day", "cnt",
        "_p - least(CAST(0 AS BIGINT), _m) AS cusum_micro",
        f"_p - least(CAST(0 AS BIGINT), _m) >= {h_micro} AS alarm",
    )


def cusum_alarms_oracle_sql(
    daily_sql: str,
    k_micro: int = 0,
    h_micro: int = 20 * MICRO,
    mu_micro: int | None = None,
) -> str:
    """DuckDB mirror of :func:`cusum_alarms` over (series, day, cnt)."""
    if mu_micro is None:
        mu_cte = f"""
    mu AS (SELECT series,
                  CAST(sum(cnt) * {MICRO} AS BIGINT) // CAST(count(*) AS BIGINT)
                    AS mu_micro
           FROM d GROUP BY series),
    dm AS (SELECT d.*, mu.mu_micro FROM d JOIN mu USING (series))"""
    else:
        mu_cte = f"""
    dm AS (SELECT d.*, CAST({mu_micro} AS BIGINT) AS mu_micro FROM d)"""
    return f"""
    WITH d AS MATERIALIZED (
      SELECT series, CAST(day AS BIGINT) AS day, CAST(cnt AS BIGINT) AS cnt
      FROM ({daily_sql})),{mu_cte},
    p AS (
      SELECT series, day, cnt,
             CAST(sum(cnt * {MICRO} - mu_micro - {k_micro}) OVER w
                  AS BIGINT) AS _p
      FROM dm
      WINDOW w AS (PARTITION BY series ORDER BY day
                   ROWS UNBOUNDED PRECEDING)),
    m AS (
      SELECT *, CAST(min(_p) OVER (PARTITION BY series ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _m
      FROM p)
    SELECT series, day, cnt,
           _p - least(CAST(0 AS BIGINT), _m) AS cusum_micro,
           _p - least(CAST(0 AS BIGINT), _m) >= {h_micro} AS alarm
    FROM m
    """


def ks_drift(
    a: DataFrame, b: DataFrame, score_col: str = "score"
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between score
    distributions, exact in micro units — ONE row:
    (n_a, n_b, ks_micro, at_score).

    The distribution-level drift monitor next to CUSUM (which watches
    a LEVEL over time) and the schema L1 (which watches categorical
    shares): KS = max_s |F_a(s) − F_b(s)| catches shape changes in a
    continuous score — a quality scorer whose new build compresses the
    tails moves KS long before any mean moves. Computed exactly on the
    pooled distinct-score grid: cumulative counts per side, difference
    as |cum_a·1e6 DIV n_a − cum_b·1e6 DIV n_b| (truncating division on
    both sides — identical in both engines; each term sits within 1
    micro of the exact CDF value, so ks_micro is within 2 micro of the
    real KS and bit-identical across engines). ``at_score`` reports
    the argmax (smallest such score under ties — deterministic).

    Scale shape: one (score, side) aggregate (map-side combined), a
    window at pooled distinct-score grain (micro-quantized scores →
    ≤ 2e6+2 rows, bounded by construction), one global max fold."""
    MICRO = 1_000_000
    sa = a.selectExpr(f"CAST({score_col} AS BIGINT) AS s",
                      "CAST(1 AS INT) AS _a")
    sb = b.selectExpr(f"CAST({score_col} AS BIGINT) AS s",
                      "CAST(0 AS INT) AS _a")
    g = (
        sa.unionByName(sb)
        .groupBy("s")
        .agg(F.sum("_a").cast("long").alias("ca"),
             (F.count("*") - F.sum("_a")).cast("long").alias("cb"))
    )
    w = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = g.select(
        "s",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    )
    tot = cum.agg(F.max("cum_a").alias("n_a"),
                  F.max("cum_b").alias("n_b"))
    d = cum.crossJoin(tot).selectExpr(  # 1-row broadcast
        "n_a", "n_b", "s",
        f"abs(cum_a * {MICRO} DIV n_a - cum_b * {MICRO} DIV n_b) AS d",
    )
    pick = F.struct((-F.col("d")).alias("nd"), F.col("s").alias("s"))
    return (
        d.groupBy("n_a", "n_b")
        .agg(F.min(pick).alias("m"))
        .selectExpr("n_a", "n_b", "-m.nd AS ks_micro", "m.s AS at_score")
    )


def ks_drift_oracle_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB mirror of :func:`ks_drift` (inputs expose ``score``)."""
    MICRO = 1_000_000
    return f"""
    WITH g AS (
      SELECT s, CAST(sum(_a) AS BIGINT) AS ca,
             CAST(count(*) - sum(_a) AS BIGINT) AS cb
      FROM (
        SELECT CAST(score AS BIGINT) AS s, 1 AS _a FROM ({a_sql})
        UNION ALL
        SELECT CAST(score AS BIGINT), 0 FROM ({b_sql}))
      GROUP BY s),
    cum AS (
      SELECT s,
             CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
             CAST(sum(cb) OVER w AS BIGINT) AS cum_b
      FROM g WINDOW w AS (ORDER BY s ROWS UNBOUNDED PRECEDING)),
    tot AS (SELECT max(cum_a) AS n_a, max(cum_b) AS n_b FROM cum),
    d AS (
      SELECT tot.n_a, tot.n_b, cum.s,
             abs(cum.cum_a * {MICRO} // tot.n_a
                 - cum.cum_b * {MICRO} // tot.n_b) AS d
      FROM cum, tot)
    SELECT n_a, n_b, d AS ks_micro, s AS at_score
    FROM d ORDER BY d DESC, s ASC LIMIT 1
    """
