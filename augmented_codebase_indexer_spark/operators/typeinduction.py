"""Domain/range induction — learn each predicate's expected subject and
object types from the typed entities it touches, then flag violations.

The schema-induction step every open-world KG pipeline runs once
extraction outgrows its seed ontology (the statistical form of RDFS
domain/range; SDType, Paulheim & Bizer ISWC'13 uses the same
type-distribution evidence): for predicate p, the DOMAIN is the
majority type among p's typed subjects and the RANGE the majority type
among its typed objects, each with support and an exact micro share of
the typed total. Induction is evidence, not policy — downstream the
induced rows feed the same SHACL-lite gate as the hand-written
constraints (`operators/kgquality.py`), and :func:`type_violations`
lists the facts whose subject/object type contradicts the induced
majority (the extraction-error shortlist a curator actually reads).

Determinism: majority = min over a (−count, type) sort key — count
ties break on type text identically in both engines (the fusion.py
argmax discipline). Untyped entities contribute nothing (inner join
against the type table); predicates none of whose subjects AND none of
whose objects are typed are absent.

Scale shape at 10^11 facts: the type table joins at entity grain
(broadcast when small, hash otherwise); counting is (pred, type) —
map-side combined to predicate-vocab × type-vocab rows; the argmax is
a groupBy-min (ONE combined row per pred over the exchange, no
window). Violations are one more entity-grain join against the
induced table (predicate-vocab-sized, broadcast).

Reference anchor: the reference validates chunk kinds against the
parser's node-kind registry before indexing
(`core/chunker/chunker.py`); this induces the registry instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _majority(side: DataFrame, key: str, type_col: str) -> DataFrame:
    """(pred, <type_col>) rows → per-pred majority type + support +
    share; ``key`` prefixes the output columns."""
    counts = side.groupBy("pred", type_col).agg(
        F.count("*").cast("long").alias("cnt")
    )
    totals = counts.groupBy("pred").agg(
        F.sum("cnt").alias(f"{key}_typed")
    )
    pick = F.struct(
        (-F.col("cnt")).alias("neg"), F.col(type_col).alias("t")
    )
    best = counts.groupBy("pred").agg(F.min(pick).alias("b")).select(
        "pred",
        F.col("b.t").alias(f"{key}_type"),
        (-F.col("b.neg")).alias(f"{key}_support"),
    )
    return best.join(totals, "pred").selectExpr(
        "pred", f"{key}_type", f"{key}_support", f"{key}_typed",
        f"{key}_support * {MICRO} DIV {key}_typed AS {key}_share_micro",
    )


def induce_domain_range(facts: DataFrame, types: DataFrame) -> DataFrame:
    """facts(subj, pred, obj) × types(entity, type) → one row per
    predicate with any typed end: (pred, domain_type, domain_support,
    domain_typed, domain_share_micro, range_type, range_support,
    range_typed, range_share_micro)."""
    f = facts.select("subj", "pred", "obj").distinct()
    t = types.select(F.col("entity"), F.col("type")).distinct()
    dom = _majority(
        f.join(t, f["subj"] == t["entity"]).select("pred", "type"),
        "domain", "type",
    )
    rng = _majority(
        f.join(t, f["obj"] == t["entity"]).select("pred", "type"),
        "range", "type",
    )
    return dom.join(rng, "pred", "full_outer").select(
        "pred",
        "domain_type", "domain_support", "domain_typed",
        "domain_share_micro",
        "range_type", "range_support", "range_typed",
        "range_share_micro",
    )


def type_violations(
    facts: DataFrame, types: DataFrame, induced: DataFrame
) -> DataFrame:
    """Facts whose TYPED subject/object contradicts the induced
    domain/range → (subj, pred, obj, fact_end, found_type, expected_type);
    ``fact_end`` ∈ {'subj', 'obj'}. Untyped ends never violate."""
    f = facts.select("subj", "pred", "obj").distinct()
    t = types.select("entity", "type").distinct()
    dom = induced.select("pred", F.col("domain_type").alias("expected_type"))
    rng = induced.select("pred", F.col("range_type").alias("expected_type"))
    subj_v = (
        f.join(t, f["subj"] == t["entity"])
        .join(dom, "pred")
        .filter(F.col("expected_type").isNotNull()
                & (F.col("type") != F.col("expected_type")))
        .select("subj", "pred", "obj", F.lit("subj").alias("fact_end"),
                F.col("type").alias("found_type"), "expected_type")
    )
    obj_v = (
        f.join(t, f["obj"] == t["entity"])
        .join(rng, "pred")
        .filter(F.col("expected_type").isNotNull()
                & (F.col("type") != F.col("expected_type")))
        .select("subj", "pred", "obj", F.lit("obj").alias("fact_end"),
                F.col("type").alias("found_type"), "expected_type")
    )
    return subj_v.unionByName(obj_v)


# separator keeps ('ab','c') and ('a','bc') hash-distinct
FACT_SEP = "\x01"


def _majority_from_counts(state: DataFrame, end: str, key: str) -> DataFrame:
    """state rows (pred, end, type, cnt) for one ``end`` → the same
    per-pred majority/support/share columns as :func:`_majority`."""
    counts = state.filter(F.col("end") == end).select("pred", "type", "cnt")
    totals = counts.groupBy("pred").agg(
        F.sum("cnt").cast("long").alias(f"{key}_typed"))
    pick = F.struct((-F.col("cnt")).alias("neg"),
                    F.col("type").alias("t"))
    best = counts.groupBy("pred").agg(F.min(pick).alias("b")).select(
        "pred",
        F.col("b.t").alias(f"{key}_type"),
        (-F.col("b.neg")).cast("long").alias(f"{key}_support"),
    )
    return best.join(totals, "pred").selectExpr(
        "pred", f"{key}_type", f"{key}_support", f"{key}_typed",
        f"{key}_support * {MICRO} DIV {key}_typed AS {key}_share_micro",
    )


def induced_from_state(state: DataFrame) -> DataFrame:
    """(pred, end, type, cnt) counts → the induce_domain_range output
    frame; state is algebraic, so merged batch states reproduce the
    one-shot induction EXACTLY (asserted in tests)."""
    dom = _majority_from_counts(state, "domain", "domain")
    rng = _majority_from_counts(state, "range", "range")
    return dom.join(rng, "pred", "full_outer").select(
        "pred",
        "domain_type", "domain_support", "domain_typed",
        "domain_share_micro",
        "range_type", "range_support", "range_typed",
        "range_share_micro",
    )


def induction_increment(
    facts_batch: DataFrame,
    types: DataFrame,
    state: DataFrame | None = None,
    seen: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incremental induction for crawl batches (the
    `paradedup.paragraph_dedup_increment` contract): dedup the batch's
    facts against ``seen`` — the persisted fact-hash relation from all
    prior batches — fold the batch's (pred, end, type) type-evidence
    counts into ``state``, and re-derive the induced schema from the
    merged state. Returns (induced, new_state, new_fact_hashes).

    Invariance: counts are ALGEBRAIC and the seen-hash anti-join makes
    cross-batch duplicate facts count once, so any batch partitioning
    of the corpus yields EXACTLY the one-shot
    :func:`induce_domain_range` output — asserted batch-boundary
    tests, and the entry's oracle IS the one-shot mirror.

    Scale shape: the state is pred-vocab × type-vocab × 2 rows
    (rewritten whole each batch — it is tiny); ``seen`` is the slim
    hash relation, bucketed like the paradedup winners table; per
    batch the cost is the batch's own type joins plus one anti-join —
    never a rescan of history."""
    f = facts_batch.select("subj", "pred", "obj").distinct().withColumn(
        "h", F.md5(F.concat_ws(FACT_SEP, "subj", "pred", "obj")))
    if seen is not None:
        f = f.join(seen.select("h"), "h", "left_anti")
    new_hashes = f.select("h").distinct()
    t = types.select("entity", "type").distinct()
    dom = (
        f.join(t, f["subj"] == t["entity"])
        .select("pred", F.lit("domain").alias("end"), "type")
    )
    rng = (
        f.join(t, f["obj"] == t["entity"])
        .select("pred", F.lit("range").alias("end"), "type")
    )
    batch_counts = (
        dom.unionByName(rng)
        .groupBy("pred", "end", "type")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    if state is not None:
        new_state = (
            state.unionByName(batch_counts)
            .groupBy("pred", "end", "type")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
    else:
        new_state = batch_counts
    return induced_from_state(new_state), new_state, new_hashes


def induced_declarations(
    induced: DataFrame,
    min_share_micro: int = 600_000,
    min_typed: int = 3,
) -> DataFrame:
    """Promote induced rows to SHACL-lite (pred, domain_type,
    range_type) declarations where BOTH ends clear the evidence bar —
    majority share ≥ min_share_micro over ≥ min_typed typed
    occurrences. Induction below the bar stays advisory; above it the
    schema loop closes: measurement becomes policy the publish gate
    enforces."""
    c = F.col
    return induced.filter(
        c("domain_type").isNotNull() & c("range_type").isNotNull()
        & (c("domain_share_micro") >= min_share_micro)
        & (c("range_share_micro") >= min_share_micro)
        & (c("domain_typed") >= min_typed)
        & (c("range_typed") >= min_typed)
    ).select("pred", "domain_type", "range_type")


def induced_declarations_oracle_sql(
    facts_sql: str, types_sql: str,
    min_share_micro: int = 600_000, min_typed: int = 3,
) -> str:
    """Mirror of :func:`induced_declarations` over the induction
    mirror."""
    return f"""
    SELECT pred, domain_type, range_type
    FROM ({induce_domain_range_oracle_sql(facts_sql, types_sql)})
    WHERE domain_type IS NOT NULL AND range_type IS NOT NULL
      AND domain_share_micro >= {min_share_micro}
      AND range_share_micro >= {min_share_micro}
      AND domain_typed >= {min_typed} AND range_typed >= {min_typed}
    """


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors
# ---------------------------------------------------------------------------

def _majority_sql(side_sql: str, key: str) -> str:
    """Mirror of :func:`_majority` (side_sql exposes pred, type); the
    argmax runs as row_number over (cnt DESC, type ASC) — the identical
    deterministic order the Spark min-struct evaluates."""
    return f"""
    WITH side AS ({side_sql}),
    counts AS (
      SELECT pred, type, CAST(count(*) AS BIGINT) AS cnt
      FROM side GROUP BY pred, type),
    totals AS (
      SELECT pred, sum(cnt) AS {key}_typed FROM counts GROUP BY pred),
    best AS (
      SELECT pred, type AS {key}_type, cnt AS {key}_support
      FROM (SELECT *, row_number() OVER (PARTITION BY pred
              ORDER BY cnt DESC, type ASC) AS rn FROM counts)
      WHERE rn = 1)
    SELECT b.pred, b.{key}_type, b.{key}_support, t.{key}_typed,
           b.{key}_support * {MICRO} // t.{key}_typed
             AS {key}_share_micro
    FROM best b JOIN totals t ON b.pred = t.pred
    """


def _induction_over_ft_sql() -> str:
    """Induction body assuming CTEs ``f`` (subj, pred, obj — deduped)
    and ``t`` (entity, type — deduped) are in scope; reused by both
    public mirrors so the violations mirror never shadows them."""
    dom = _majority_sql(
        "SELECT f.pred, t.type FROM f JOIN t ON f.subj = t.entity",
        "domain",
    )
    rng = _majority_sql(
        "SELECT f.pred, t.type FROM f JOIN t ON f.obj = t.entity",
        "range",
    )
    return f"""
    WITH dom AS MATERIALIZED ({dom}),
    rng AS MATERIALIZED ({rng})
    SELECT coalesce(dom.pred, rng.pred) AS pred,
           domain_type, domain_support, domain_typed, domain_share_micro,
           range_type, range_support, range_typed, range_share_micro
    FROM dom FULL OUTER JOIN rng ON dom.pred = rng.pred
    """


def induce_domain_range_oracle_sql(facts_sql: str, types_sql: str) -> str:
    """Mirror of :func:`induce_domain_range`."""
    return f"""
    WITH f AS MATERIALIZED (
      SELECT DISTINCT subj, pred, obj FROM ({facts_sql})),
    t AS MATERIALIZED (
      SELECT DISTINCT entity, type FROM ({types_sql}))
    SELECT * FROM ({_induction_over_ft_sql()})
    """


def type_violations_oracle_sql(facts_sql: str, types_sql: str) -> str:
    """Mirror of :func:`type_violations` composed over the induction
    mirror (the induction body runs over the SAME f/t CTEs)."""
    return f"""
    WITH f AS MATERIALIZED (
      SELECT DISTINCT subj, pred, obj FROM ({facts_sql})),
    t AS MATERIALIZED (
      SELECT DISTINCT entity, type FROM ({types_sql})),
    ind AS MATERIALIZED ({_induction_over_ft_sql()})
    SELECT f.subj, f.pred, f.obj, 'subj' AS fact_end,
           t.type AS found_type, i.domain_type AS expected_type
    FROM f JOIN t ON f.subj = t.entity
           JOIN ind i ON f.pred = i.pred
    WHERE i.domain_type IS NOT NULL AND t.type <> i.domain_type
    UNION ALL
    SELECT f.subj, f.pred, f.obj, 'obj' AS fact_end,
           t.type AS found_type, i.range_type AS expected_type
    FROM f JOIN t ON f.obj = t.entity
           JOIN ind i ON f.pred = i.pred
    WHERE i.range_type IS NOT NULL AND t.type <> i.range_type
    """
