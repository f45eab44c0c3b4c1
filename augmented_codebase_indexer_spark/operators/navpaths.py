"""Navigation-path mining — frequent event-type n-grams per actor
stream, the sequence complement of the first-order transition matrix.

The transition matrix (`operators/transitions.py`) is memoryless;
path n-grams expose the MULTI-step behaviors product and crawl
analysis actually ask about ("view→click→error", "search→search→
search" rage loops) — the classic clickstream sequential-pattern
baseline (the contiguous-window tier of AprioriAll, Agrawal & Srikant
ICDE'95: exhaustive contiguous n-grams, not gapped subsequences —
gapped patterns need the lattice walk and rarely pay at n ≤ 4).

Per actor, events order by (ts, event_id) — a total order, so window
``lead`` is deterministic; each position contributes the n-gram of
itself and its n−1 successors (streams shorter than n contribute
nothing). Output: one row per distinct path with its count and exact
micro share of ALL path occurrences.

Scale shape: ONE partitioned window pass on the actor key (the same
exchange sessionization uses — compose after `sessionize` to bound
paths inside sessions), one (e1..en) aggregate map-side combined to
path-vocabulary rows, one 1-row broadcast for the share. No
unpartitioned window, no collect.

Reference anchor: the reference mines call-sequence patterns from its
reference graph (`core/graph`); this is the event-stream form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def path_ngrams(
    events: DataFrame,
    n: int = 3,
    min_count: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """events → (e1..en, n_paths, share_micro): contiguous event-type
    n-grams per actor, counted corpus-wide."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    cols = [F.col(type_col).alias("e1")] + [
        F.lead(type_col, i).over(w).alias(f"e{i + 1}")
        for i in range(1, n)
    ]
    grams = events.select(*cols).filter(F.col(f"e{n}").isNotNull())
    names = [f"e{i + 1}" for i in range(n)]
    counts = grams.groupBy(*names).agg(
        F.count("*").cast("long").alias("n_paths"))
    total = counts.agg(F.sum("n_paths").cast("long").alias("_tot"))
    return (
        counts.crossJoin(total)  # 1-row broadcast
        .filter(F.col("n_paths") >= min_count)
        .selectExpr(
            *names, "n_paths",
            f"n_paths * {MICRO} DIV _tot AS share_micro",
        )
    )


def path_ngrams_oracle_sql(
    events_sql: str, n: int = 3, min_count: int = 1
) -> str:
    """DuckDB mirror of :func:`path_ngrams` over
    (event_id, ts, user_id, event_type)."""
    leads = ", ".join(
        ["event_type AS e1"]
        + [f"lead(event_type, {i}) OVER w AS e{i + 1}"
           for i in range(1, n)]
    )
    names = ", ".join(f"e{i + 1}" for i in range(n))
    return f"""
    WITH grams AS MATERIALIZED (
      SELECT {leads}
      FROM ({events_sql})
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    counts AS (
      SELECT {names}, CAST(count(*) AS BIGINT) AS n_paths
      FROM grams WHERE e{n} IS NOT NULL GROUP BY {names}),
    tot AS (SELECT CAST(sum(n_paths) AS BIGINT) AS _tot FROM counts)
    SELECT {names}, n_paths,
           n_paths * {MICRO} // _tot AS share_micro
    FROM counts, tot WHERE n_paths >= {min_count}
    """
