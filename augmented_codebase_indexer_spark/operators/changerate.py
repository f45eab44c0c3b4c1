"""Page change-rate estimation — the Cho & Garcia-Molina estimator
(TOIT'03 "Estimating frequency of change"): a page revisited n+1 times
with X observed content changes under a Poisson change process has

    λ̂ = −ln(1 − X/n) / Ī  =  ln(n / (n − X)) / Ī

(the naive X/n underestimates because multiple changes between visits
collapse into one observation).  λ̂ drives the freshness-optimal
recrawl cadence — the adaptive upgrade over the fixed changed-since
rule in `operators/sitemaps.py::recrawl_candidates`.

Exactness: changes are detected by a lag() over (url, fetch order) —
hash inequality, no content comparison; ``rate_micro = ln_micro(n /
(n−X))`` comes from the libm-free fixed-point log
(`functions/intlog.py`), evaluated once per DISTINCT (n, n−X) pair —
the observation-count vocabulary, tiny next to the url table — and
joined back broadcast.  ``revisit_sec = Ī·1e6 DIV rate_micro`` is the
estimator inverted to a cadence.  Estimator boundaries are explicit:
one visit (n = 0) → NULLs (no information); X = 0 → rate 0, revisit
NULL (never observed changing — back off to the sitemap tier);
X = n → rate NULL, revisit NULL with ``always_changed`` true (the
estimator diverges; recrawl at the politeness floor).

Scale shape at 10^10 log rows: one url-keyed window (visits-per-url
state) + one url-keyed aggregate; the intlog chain runs over the
distinct-count vocabulary only, never per url.

Reference anchor: the reference's watch debouncer adapts to event
cadence per path (`src/aci/core/debouncer.py`) — this is the
statistically grounded web form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.functions.intlog import (
    duckdb_ln_micro_sql,
    with_ln_micro,
)

MICRO = 1_000_000


def change_rates(
    fetch_log: DataFrame,
    url_col: str = "url",
    epoch_col: str = "fetch_epoch",
    hash_col: str = "content_hash",
) -> DataFrame:
    """→ (url, n_intervals, n_changes, span_sec, avg_interval_sec,
    rate_micro, revisit_sec, always_changed): the per-url change model.
    Duplicate (url, epoch) rows collapse to one observation (min hash —
    deterministic) before ordering."""
    from augmented_codebase_indexer_spark.operators.guards import (
        register_pin,
    )

    obs = (
        fetch_log.select(
            F.col(url_col).alias("url"),
            F.col(epoch_col).cast("long").alias("t"),
            F.col(hash_col).alias("h"),
        )
        .groupBy("url", "t")
        .agg(F.min("h").alias("h"))
    )
    w = "OVER (PARTITION BY url ORDER BY t)"
    per_url = register_pin(
        obs.selectExpr(
            "url", "t", "h",
            f"lag(h) {w} AS prev_h",
        )
        .groupBy("url")
        .agg(
            (F.count("*") - 1).cast("long").alias("n_intervals"),
            F.sum(
                F.when(
                    F.col("prev_h").isNotNull()
                    & (F.col("h") != F.col("prev_h")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_changes"),
            (F.max("t") - F.min("t")).alias("span_sec"),
        )
        .persist()
    )
    vals = (
        per_url.filter(
            (F.col("n_intervals") > 0)
            & (F.col("n_changes") > 0)
            & (F.col("n_changes") < F.col("n_intervals"))
        )
        .selectExpr("n_intervals AS _n", "n_intervals - n_changes AS _d")
        .distinct()
    )
    lnt = with_ln_micro(vals, "_n", "_d", "rate_micro")
    return (
        per_url.join(
            F.broadcast(lnt),
            (F.col("n_intervals") == F.col("_n"))
            & (F.col("n_intervals") - F.col("n_changes") == F.col("_d")),
            "left",
        )
        .selectExpr(
            "url", "n_intervals", "n_changes", "span_sec",
            "CASE WHEN n_intervals = 0 THEN NULL "
            "ELSE span_sec DIV n_intervals END AS avg_interval_sec",
            "CASE WHEN n_intervals = 0 THEN NULL "
            "WHEN n_changes = 0 THEN 0 "
            "WHEN n_changes = n_intervals THEN NULL "
            "ELSE rate_micro END AS rate_micro",
            f"CASE WHEN n_intervals > 0 AND n_changes > 0 "
            f"AND n_changes < n_intervals AND rate_micro > 0 "
            f"THEN (span_sec DIV n_intervals) * {MICRO} DIV rate_micro "
            "END AS revisit_sec",
            "n_intervals > 0 AND n_changes = n_intervals"
            " AS always_changed",
        )
    )


def change_rates_oracle_sql(fetch_log_sql: str) -> str:
    """DuckDB mirror: same dedup/window/aggregate, the same intlog
    chain over the distinct (n, n−X) vocabulary."""
    lnt = duckdb_ln_micro_sql(
        "SELECT _n, _d FROM vals", "_n", "_d", "rate_micro", "_n, _d"
    )
    return f"""
    WITH obs AS (
      SELECT url, CAST(fetch_epoch AS BIGINT) AS t,
             min(content_hash) AS h
      FROM ({fetch_log_sql}) GROUP BY url, fetch_epoch),
    lagged AS (
      SELECT url, t, h,
             lag(h) OVER (PARTITION BY url ORDER BY t) AS prev_h
      FROM obs),
    per_url AS MATERIALIZED (
      SELECT url, CAST(count(*) - 1 AS BIGINT) AS n_intervals,
             CAST(coalesce(sum(CASE WHEN prev_h IS NOT NULL
                                    AND h <> prev_h THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_changes,
             max(t) - min(t) AS span_sec
      FROM lagged GROUP BY url),
    vals AS MATERIALIZED (
      SELECT DISTINCT n_intervals AS _n,
             n_intervals - n_changes AS _d
      FROM per_url
      WHERE n_intervals > 0 AND n_changes > 0
        AND n_changes < n_intervals),
    lnt AS MATERIALIZED ({lnt})
    SELECT p.url, p.n_intervals, p.n_changes, p.span_sec,
           CASE WHEN p.n_intervals = 0 THEN NULL
                ELSE p.span_sec // p.n_intervals END AS avg_interval_sec,
           CASE WHEN p.n_intervals = 0 THEN NULL
                WHEN p.n_changes = 0 THEN 0
                WHEN p.n_changes = p.n_intervals THEN NULL
                ELSE l.rate_micro END AS rate_micro,
           CASE WHEN p.n_intervals > 0 AND p.n_changes > 0
                AND p.n_changes < p.n_intervals AND l.rate_micro > 0
                THEN (p.span_sec // p.n_intervals) * {MICRO}
                     // l.rate_micro END AS revisit_sec,
           p.n_intervals > 0 AND p.n_changes = p.n_intervals
             AS always_changed
    FROM per_url p
    LEFT JOIN lnt l ON l._n = p.n_intervals
                   AND l._d = p.n_intervals - p.n_changes
    """
