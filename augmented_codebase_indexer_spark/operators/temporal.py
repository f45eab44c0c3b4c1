"""Temporal knowledge-graph versioning: SCD2 validity intervals and
point-in-time snapshots over crawl-timestamped triples.

A web-scale KG is built from repeated crawls: the same (subj, pred) is
asserted at many ``warc_ts`` with possibly different objects ("CEO of X"
changes over crawls). The reference keeps only latest-write-wins rows
(its index upsert replaces a file's symbols wholesale on re-index,
`src/aci/services/indexing_service.py:118-150`); a temporal KG instead
keeps every version with its validity window — the standard
slowly-changing-dimension type-2 (SCD2) shape — and answers "the graph
as of T" with a filter instead of a rebuild.

Relational formulation (gaps-and-islands, no UDF, SQL-mirrorable):

1. one fact per (key, ts): deterministic ``min(val)`` collapse;
2. change flag: ``lag(val)`` differs → 1;
3. island id: running sum of flags per key;
4. per-island collapse: ``valid_from = min(ts)``, ``n_obs = count``;
5. ``valid_to = lead(valid_from)`` per key; NULL ⇒ current version.

Scale: every window and groupBy is keyed by (subj, pred) or a superset,
so the whole operator is ONE hash exchange on the entity key — Catalyst
reuses the (subj, pred) partitioning for the island groupBy (subset
clustering satisfies it) and both lead/lag windows. No global window,
no text in the shuffle (keys + object ids + int64 timestamps). Hot-key
skew (a celebrity entity re-asserted every crawl) stays bounded because
rows per (subj, pred) ≈ number of crawls, not corpus size; AQE skew
split covers the pathological tail.

Timestamps are int64 epoch seconds end-to-end (the repo's cross-engine
exactness discipline — no float, no timezone semantics in the gate).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def scd2_intervals(
    facts: DataFrame,
    key_cols: Sequence[str] = ("subj", "pred"),
    ts_col: str = "ts",
    val_col: str = "obj",
) -> DataFrame:
    """Collapse timestamped facts into SCD2 version rows.

    Returns one row per maximal run of consecutive identical values per
    key: (*key_cols, val_col, valid_from, valid_to, is_current, n_obs).
    ``valid_to`` is exclusive and NULL for the live version. Facts that
    collide on (key, ts) collapse to ``min(val)`` first so the island
    scan has a deterministic total order.
    """
    keys = [F.col(k) for k in key_cols]
    # One explicit entity-key exchange up front: the (key, ts) dedup agg,
    # both windows and the run groupBy are all satisfied by it (subset /
    # superset clustering), so no further shuffle appears. Without the
    # explicit hint Spark sometimes hashes the dedup agg on the full
    # (key, ts) grouping and pays a second exchange for the windows —
    # observed plan-dependent (constant-folding of pred decides it).
    dedup = (
        facts.repartition(*keys)
        .groupBy(*key_cols, ts_col)
        .agg(F.min(val_col).alias(val_col))
    )

    w_ts = Window.partitionBy(*keys).orderBy(ts_col)
    flagged = dedup.withColumn(
        "_chg",
        F.when(
            F.lag(val_col).over(w_ts).isNull()
            | (F.lag(val_col).over(w_ts) != F.col(val_col)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "_island",
        F.sum("_chg").over(w_ts.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = islands.groupBy(*key_cols, val_col, "_island").agg(
        F.min(ts_col).cast("long").alias("valid_from"),
        F.count("*").cast("long").alias("n_obs"),
    )
    w_runs = Window.partitionBy(*keys).orderBy("valid_from")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w_runs))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_island")
        .select(*key_cols, val_col, "valid_from", "valid_to", "is_current", "n_obs")
    )


def scd2_merge(
    existing: DataFrame,
    old_facts: DataFrame,
    new_facts: DataFrame,
    key_cols: Sequence[str] = ("subj", "pred"),
    ts_col: str = "ts",
    val_col: str = "obj",
) -> DataFrame:
    """Fold a new crawl batch into an existing SCD2 frame incrementally.

    Only keys PRESENT IN THE BATCH are recomputed — their full fact
    history is replayed from ``old_facts`` (the warehouse's fact log)
    union the batch, handling out-of-order and retroactive timestamps;
    every untouched key passes through verbatim via an anti-join.
    Invariant (gated in tests, the `incremental_update` Property-15
    analog): ``scd2_merge(scd2_intervals(old), old, batch)`` equals
    ``scd2_intervals(old ∪ batch)`` for ANY split of the facts into
    old/batch, in any arrival order.

    Per-trigger cost is O(batch + affected-key history) — rows per key
    ≈ crawl count, so a batch touching K entities replays ~K·crawls
    rows regardless of corpus size. Same convergence contract as
    `streaming/curation_stream.py::curate_increment`. In a warehouse
    deployment the recomputed keys land via `Warehouse.upsert_buckets`
    keyed on the entity hash, so the rewrite touches only their buckets.
    """
    keys = list(key_cols)
    batch_keys = new_facts.select(*keys).distinct()
    affected = old_facts.join(batch_keys, keys, "left_semi").unionByName(
        new_facts
    )
    recomputed = scd2_intervals(affected, key_cols, ts_col, val_col)
    untouched = existing.join(batch_keys, keys, "left_anti")
    return untouched.unionByName(recomputed)


def snapshot_asof(
    scd2: DataFrame, as_of: int
) -> DataFrame:
    """The graph as of ``as_of`` (epoch seconds): the version row whose
    [valid_from, valid_to) window contains it. Narrow filter over the
    SCD2 frame — no recompute, no shuffle."""
    return scd2.filter(
        (F.col("valid_from") <= F.lit(as_of))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(as_of)))
    ).drop("is_current")


def snapshot_diff(
    scd2: DataFrame,
    t1: int,
    t2: int,
    key_cols: Sequence[str] = ("subj", "pred"),
    val_col: str = "obj",
) -> DataFrame:
    """What changed in the graph between ``t1`` and ``t2``: per key,
    'added' (no version at t1), 'removed' (no version at t2), 'changed'
    (different values), or absent from the output if unchanged. Returns
    (*key_cols, old_<val>, new_<val>, change) — a full-outer join of two
    narrow snapshot filters over the same materialized SCD2 frame (the
    J1 incremental-diff shape applied to time travel)."""
    keys = list(key_cols)
    s1 = snapshot_asof(scd2, t1).select(*keys, F.col(val_col).alias("old_" + val_col))
    s2 = snapshot_asof(scd2, t2).select(*keys, F.col(val_col).alias("new_" + val_col))
    old_c, new_c = F.col("old_" + val_col), F.col("new_" + val_col)
    return (
        s1.join(s2, keys, "full_outer")
        .withColumn(
            "change",
            F.when(old_c.isNull(), F.lit("added"))
            .when(new_c.isNull(), F.lit("removed"))
            .when(old_c != new_c, F.lit("changed"))
            .otherwise(F.lit("unchanged")),
        )
        .filter(F.col("change") != "unchanged")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirror
# ---------------------------------------------------------------------------

def scd2_oracle_sql(
    facts_sql: str,
    key_cols: Sequence[str] = ("subj", "pred"),
    ts_col: str = "ts",
    val_col: str = "obj",
    as_of: int | None = None,
) -> str:
    """Exact mirror of :func:`scd2_intervals` (and, with ``as_of``, of
    :func:`snapshot_asof`) over a ``facts_sql`` relation."""
    k = ", ".join(key_cols)
    base = f"""
    WITH facts AS ({facts_sql}),
    dedup AS (
      SELECT {k}, {ts_col}, min({val_col}) AS {val_col}
      FROM facts GROUP BY {k}, {ts_col}),
    flagged AS (
      SELECT *,
             CASE WHEN lag({val_col}) OVER w IS NULL
                       OR lag({val_col}) OVER w <> {val_col}
                  THEN 1 ELSE 0 END AS chg
      FROM dedup
      WINDOW w AS (PARTITION BY {k} ORDER BY {ts_col})),
    isl AS (
      SELECT *, sum(chg) OVER (PARTITION BY {k} ORDER BY {ts_col}
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged),
    runs AS (
      SELECT {k}, {val_col}, island,
             CAST(min({ts_col}) AS BIGINT) AS valid_from,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM isl GROUP BY {k}, {val_col}, island),
    scd AS (
      SELECT {k}, {val_col}, valid_from,
             lead(valid_from) OVER (PARTITION BY {k} ORDER BY valid_from)
               AS valid_to,
             n_obs
      FROM runs)"""
    if as_of is None:
        return base + f"""
    SELECT {k}, {val_col}, valid_from, valid_to,
           valid_to IS NULL AS is_current, n_obs
    FROM scd
    """
    return base + f"""
    SELECT {k}, {val_col}, valid_from, valid_to, n_obs
    FROM scd
    WHERE valid_from <= {as_of}
      AND (valid_to IS NULL OR valid_to > {as_of})
    """


def snapshot_diff_oracle_sql(
    facts_sql: str,
    t1: int,
    t2: int,
    key_cols: Sequence[str] = ("subj", "pred"),
    ts_col: str = "ts",
    val_col: str = "obj",
) -> str:
    """Exact mirror of :func:`snapshot_diff` over the same facts."""
    k = ", ".join(key_cols)
    base = scd2_oracle_sql(facts_sql, key_cols, ts_col, val_col)
    snap = (
        "SELECT {k}, {v} FROM ({base}) WHERE valid_from <= {t} "
        "AND (valid_to IS NULL OR valid_to > {t})"
    )
    s1 = snap.format(k=k, v=val_col, base=base, t=t1)
    s2 = snap.format(k=k, v=val_col, base=base, t=t2)
    on = " AND ".join(f"s1.{c} = s2.{c}" for c in key_cols)
    key_sel = ",\n           ".join(
        f"COALESCE(s1.{c}, s2.{c}) AS {c}" for c in key_cols
    )
    return f"""
    SELECT {key_sel},
           s1.{val_col} AS old_{val_col},
           s2.{val_col} AS new_{val_col},
           CASE WHEN s1.{val_col} IS NULL THEN 'added'
                WHEN s2.{val_col} IS NULL THEN 'removed'
                ELSE 'changed' END AS change
    FROM ({s1}) s1
    FULL OUTER JOIN ({s2}) s2 ON {on}
    WHERE s1.{val_col} IS NULL OR s2.{val_col} IS NULL
       OR s1.{val_col} <> s2.{val_col}
    """


def predicate_volatility(
    intervals: DataFrame,
    pred_col: str = "pred",
    key_col: str = "subj",
) -> DataFrame:
    """SCD2 intervals → per-predicate churn profile: which predicates are
    stable (capital_of) and which turn over (works_for). The standard
    temporal-KG diagnostic for choosing recrawl cadence and snapshot
    retention per predicate (the reference's analog is per-language
    update counters in get_index_status).

    One algebraic groupBy over the intervals frame:

    * ``n_keys`` / ``n_versions``, and their exact ratio
      ``versions_per_key_micro`` (BIGINT cross-multiply);
    * ``n_closed`` versions plus ``closed_dur_s_total`` and the exact
      ``mean_closed_dur_s = total DIV n_closed`` (NULL when nothing
      closed yet — guarded on BOTH engines, DuckDB errors on // 0).

    All BIGINT — the oracle is exact by construction."""
    closed = F.col("valid_to").isNotNull()
    agg = intervals.groupBy(F.col(pred_col).alias("pred")).agg(
        F.count_distinct(F.col(key_col)).cast("long").alias("n_keys"),
        F.count("*").cast("long").alias("n_versions"),
        F.sum(F.when(closed, 1).otherwise(0)).cast("long").alias("n_closed"),
        F.sum(
            F.when(closed, F.col("valid_to") - F.col("valid_from")).otherwise(0)
        ).cast("long").alias("closed_dur_s_total"),
    )
    return agg.select(
        "pred",
        "n_keys",
        "n_versions",
        F.expr("n_versions * 1000000 DIV n_keys").alias("versions_per_key_micro"),
        "n_closed",
        "closed_dur_s_total",
        F.when(
            F.col("n_closed") > 0,
            F.expr("closed_dur_s_total DIV n_closed"),
        ).cast("long").alias("mean_closed_dur_s"),
    )


def predicate_volatility_sql(intervals_sql: str) -> str:
    """DuckDB mirror over any relation exposing (pred, subj, valid_from,
    valid_to)."""
    return f"""
    WITH iv AS ({intervals_sql}),
    agg AS (
      SELECT pred,
             CAST(count(DISTINCT subj) AS BIGINT) AS n_keys,
             CAST(count(*) AS BIGINT) AS n_versions,
             CAST(sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_closed,
             CAST(sum(CASE WHEN valid_to IS NOT NULL
                           THEN valid_to - valid_from ELSE 0 END)
                  AS BIGINT) AS closed_dur_s_total
      FROM iv GROUP BY pred)
    SELECT pred, n_keys, n_versions,
           CAST((n_versions * 1000000) // n_keys AS BIGINT)
             AS versions_per_key_micro,
           n_closed, closed_dur_s_total,
           CASE WHEN n_closed > 0
                THEN CAST(closed_dur_s_total // n_closed AS BIGINT)
                ELSE NULL END AS mean_closed_dur_s
    FROM agg
    """


# the 13 Allen relations (Allen, CACM'83 "Maintaining knowledge about
# temporal intervals") over HALF-OPEN [s, e) intervals — the SCD2
# convention above. The CASE ladder is exhaustive and mutually
# exclusive for any s1 < e1, s2 < e2, so the classification is a total
# function and identical in both engines (pure integer comparisons).
_ALLEN_CASE = """CASE
  WHEN s1 = s2 AND e1 = e2 THEN 'equal'
  WHEN e1 < s2 THEN 'before'
  WHEN s1 > e2 THEN 'after'
  WHEN e1 = s2 THEN 'meets'
  WHEN s1 = e2 THEN 'met_by'
  WHEN s1 = s2 AND e1 < e2 THEN 'starts'
  WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
  WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
  WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
  WHEN s1 > s2 AND e1 < e2 THEN 'during'
  WHEN s1 < s2 AND e1 > e2 THEN 'contains'
  WHEN s1 < s2 THEN 'overlaps'
  ELSE 'overlapped_by' END"""


def allen_relations(
    a: DataFrame,
    b: DataFrame,
    key_cols: tuple[str, ...] = ("subj_id", "pred"),
) -> DataFrame:
    """→ (*key_cols, s1, e1, s2, e2, relation): every interval pair
    sharing a key, classified into the 13 Allen relations over
    half-open [s, e) integer intervals (the SCD2 convention; a live
    version's NULL valid_to should be closed to a horizon by the caller
    — relations against an unbounded end are not classifiable).

    The KG temporal-QA operator: 'works_at X' DURING 'lives_in Y',
    conflicting versions that OVERLAP when SCD2 says they shouldn't,
    succession chains that MEET. Key-equi-join only — co-located under
    the fact table's entity bucketing; the pair fan-out is bounded by
    versions-per-key squared (versions per key are small by
    construction; SCD2 collapses repeats)."""
    left = a.select(
        *key_cols,
        F.col("valid_from").cast("long").alias("s1"),
        F.col("valid_to").cast("long").alias("e1"),
    )
    right = b.select(
        *key_cols,
        F.col("valid_from").cast("long").alias("s2"),
        F.col("valid_to").cast("long").alias("e2"),
    )
    return (
        left.join(right, list(key_cols))
        .filter("s1 < e1 AND s2 < e2")
        .selectExpr(
            *key_cols, "s1", "e1", "s2", "e2",
            f"{_ALLEN_CASE} AS relation",
        )
    )


def allen_relations_oracle_sql(
    a_sql: str, b_sql: str, key_cols: tuple[str, ...] = ("subj_id", "pred")
) -> str:
    keys = ", ".join(key_cols)
    on = " AND ".join(f"a.{k} = b.{k}" for k in key_cols)
    akeys = ", ".join(f"a.{k}" for k in key_cols)
    return f"""
    WITH a AS (SELECT {keys}, CAST(valid_from AS BIGINT) AS s1,
                      CAST(valid_to AS BIGINT) AS e1 FROM ({a_sql})),
    b AS (SELECT {keys}, CAST(valid_from AS BIGINT) AS s2,
                 CAST(valid_to AS BIGINT) AS e2 FROM ({b_sql}))
    SELECT {akeys}, a.s1, a.e1, b.s2, b.e2,
           {_ALLEN_CASE} AS relation
    FROM a JOIN b ON {on}
    WHERE s1 < e1 AND s2 < e2
    """


_OPEN_SENTINEL = 9_223_372_036_854_775_807


def temporal_conflicts(
    versions: DataFrame,
    functional_preds: Sequence[str],
    key_cols: Sequence[str] = ("subj", "pred"),
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    val_col: str = "obj",
) -> DataFrame:
    """Time-aware functional-violation detection over merged SCD2
    version tables: two versions of the same (subj, functional pred)
    with DIFFERENT objects whose validity intervals OVERLAP are a
    contradiction no snapshot can hide — 'born_in Paris' and 'born_in
    Rome' can coexist in a timeline only if the intervals are disjoint
    (which for born_in they never legitimately are).

    The atemporal functional gate (`operators/kgquality.py::
    functional_violations`) flags any multi-object subject; this is
    the refinement a TEMPORAL KG needs: works_at legitimately takes
    many objects ACROSS time and stays out of ``functional_preds``,
    while a declared-functional predicate conflicts exactly when
    intervals intersect. Within one source SCD2 intervals are disjoint
    by construction, so every reported row is a CROSS-SOURCE
    disagreement — the fusion tier's work queue, with the disputed
    window attached.

    Output: (subj, pred, obj_a, obj_b, overlap_from, overlap_to) with
    obj_a < obj_b; ``overlap_to`` NULL when both versions are open-
    ended. Half-open [from, to) semantics; NULL ``to`` = live.

    Scale shape: one pred-filter (functional set is policy-sized),
    one (subj, pred) self-join — co-partitioned on the same entity key
    every SCD2 stage already shuffles on — and a constant-width
    interval predicate. No window, no text."""
    preds = list(functional_preds)
    keys = list(key_cols)
    v = (
        versions.select(*keys, val_col, from_col, to_col)
        .filter(F.col("pred").isin(preds))
        .distinct()
    )
    a = v.select(
        *keys,
        F.col(val_col).alias("obj_a"),
        F.col(from_col).alias("_fa"),
        F.coalesce(F.col(to_col), F.lit(_OPEN_SENTINEL)).alias("_ta"),
    )
    b = v.select(
        *keys,
        F.col(val_col).alias("obj_b"),
        F.col(from_col).alias("_fb"),
        F.coalesce(F.col(to_col), F.lit(_OPEN_SENTINEL)).alias("_tb"),
    )
    return (
        a.join(b, keys)
        .filter(
            (F.col("obj_a") < F.col("obj_b"))
            & (F.col("_fa") < F.col("_tb"))
            & (F.col("_fb") < F.col("_ta"))
        )
        .selectExpr(
            *keys, "obj_a", "obj_b",
            "greatest(_fa, _fb) AS overlap_from",
            f"nullif(least(_ta, _tb), {_OPEN_SENTINEL}) AS overlap_to",
        )
    )


def temporal_conflicts_oracle_sql(
    versions_sql: str, functional_preds: Sequence[str]
) -> str:
    """DuckDB mirror of :func:`temporal_conflicts` over a versions
    relation exposing (subj, pred, obj, valid_from, valid_to)."""
    preds = ", ".join(f"'{p}'" for p in functional_preds)
    return f"""
    WITH v AS MATERIALIZED (
      SELECT DISTINCT subj, pred, obj, valid_from,
             coalesce(valid_to, {_OPEN_SENTINEL}) AS vt
      FROM ({versions_sql}) WHERE pred IN ({preds}))
    SELECT a.subj, a.pred, a.obj AS obj_a, b.obj AS obj_b,
           greatest(a.valid_from, b.valid_from) AS overlap_from,
           nullif(least(a.vt, b.vt), {_OPEN_SENTINEL}) AS overlap_to
    FROM v a JOIN v b
      ON a.subj = b.subj AND a.pred = b.pred AND a.obj < b.obj
    WHERE a.valid_from < b.vt AND b.valid_from < a.vt
    """
