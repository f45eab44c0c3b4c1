"""Schema drift monitor — per-predicate object-type distribution shift
between two KG snapshots.

The nightly question after extraction changes: "did any predicate's
RANGE quietly move?" (a parser regression that starts extracting dates
where orgs belong shifts works_at's object-type mix long before any
hand-written constraint fires). The monitor compares, per predicate,
the distribution of object TYPES between snapshot A and snapshot B as
the exact L1 (total-variation ×2) distance over micro shares:

    l1_micro = Σ_types | cnt_a·1e6 DIV n_a  −  cnt_b·1e6 DIV n_b |

— integer by construction (no KL, no logs: L1 is the drift measure
that needs no smoothing and treats vanished types linearly, which is
what a monitor wants; range 0..2e6). Predicates present in only one
snapshot are reported with status 'new'/'gone' and NULL l1 rather
than a fabricated maximum. Untyped objects contribute nothing (the
induction discipline of `operators/typeinduction.py`).

Scale shape at 10^11 facts/side: one entity-grain type join and one
(pred, type) aggregate PER SIDE (map-side combined to pred-vocab ×
type-vocab rows), then all folds at that vocabulary grain. The type
join is shared with induction when run in the same job.

Reference anchor: the reference diffs symbol-kind histograms between
index builds (`core/indexer` stats); this is the typed-range form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _type_counts(facts: DataFrame, types: DataFrame, side: str) -> DataFrame:
    f = facts.select("subj", "pred", "obj").distinct()
    t = types.select("entity", "type").distinct()
    return (
        f.join(t, f["obj"] == t["entity"])
        .groupBy("pred", "type")
        .agg(F.count("*").cast("long").alias(f"cnt_{side}"))
    )


def schema_drift(
    facts_a: DataFrame, facts_b: DataFrame, types: DataFrame
) -> DataFrame:
    """→ one row per predicate with a typed object end in either
    snapshot: (pred, n_a, n_b, l1_micro, status)."""
    ca = _type_counts(facts_a, types, "a")
    cb = _type_counts(facts_b, types, "b")
    m = (
        ca.join(cb, ["pred", "type"], "full_outer")
        .select(
            "pred", "type",
            F.coalesce("cnt_a", F.lit(0)).cast("long").alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).cast("long").alias("cnt_b"),
        )
    )
    tot = m.groupBy("pred").agg(
        F.sum("cnt_a").alias("n_a"), F.sum("cnt_b").alias("n_b"))
    j = m.join(tot, "pred")
    diff = j.selectExpr(
        "pred", "n_a", "n_b",
        f"abs(CASE WHEN n_a = 0 THEN 0 ELSE cnt_a * {MICRO} DIV n_a END"
        f" - CASE WHEN n_b = 0 THEN 0 ELSE cnt_b * {MICRO} DIV n_b END)"
        " AS d",
    )
    return (
        diff.groupBy("pred", "n_a", "n_b")
        .agg(F.sum("d").cast("long").alias("_l1"))
        .selectExpr(
            "pred", "n_a", "n_b",
            "CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE _l1 END"
            " AS l1_micro",
            "CASE WHEN n_a = 0 THEN 'new' WHEN n_b = 0 THEN 'gone'"
            " ELSE 'both' END AS status",
        )
    )


def schema_drift_oracle_sql(
    facts_a_sql: str, facts_b_sql: str, types_sql: str
) -> str:
    """DuckDB mirror of :func:`schema_drift`."""
    def side(fsql: str, s: str) -> str:
        return f"""
      SELECT f.pred, t.type, CAST(count(*) AS BIGINT) AS cnt_{s}
      FROM (SELECT DISTINCT subj, pred, obj FROM ({fsql})) f
      JOIN (SELECT DISTINCT entity, type FROM ({types_sql})) t
        ON f.obj = t.entity
      GROUP BY f.pred, t.type"""

    return f"""
    WITH ca AS MATERIALIZED ({side(facts_a_sql, 'a')}),
    cb AS MATERIALIZED ({side(facts_b_sql, 'b')}),
    m AS MATERIALIZED (
      SELECT coalesce(ca.pred, cb.pred) AS pred,
             coalesce(ca.type, cb.type) AS type,
             CAST(coalesce(cnt_a, 0) AS BIGINT) AS cnt_a,
             CAST(coalesce(cnt_b, 0) AS BIGINT) AS cnt_b
      FROM ca FULL OUTER JOIN cb
        ON ca.pred = cb.pred AND ca.type = cb.type),
    tot AS (SELECT pred, CAST(sum(cnt_a) AS BIGINT) AS n_a,
                   CAST(sum(cnt_b) AS BIGINT) AS n_b
            FROM m GROUP BY pred),
    diff AS (
      SELECT m.pred, tot.n_a, tot.n_b,
             abs(CASE WHEN tot.n_a = 0 THEN 0
                      ELSE m.cnt_a * {MICRO} // tot.n_a END
               - CASE WHEN tot.n_b = 0 THEN 0
                      ELSE m.cnt_b * {MICRO} // tot.n_b END) AS d
      FROM m JOIN tot ON m.pred = tot.pred)
    SELECT pred, n_a, n_b,
           CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
                ELSE CAST(sum(d) AS BIGINT) END AS l1_micro,
           CASE WHEN n_a = 0 THEN 'new' WHEN n_b = 0 THEN 'gone'
                ELSE 'both' END AS status
    FROM diff GROUP BY pred, n_a, n_b
    """
