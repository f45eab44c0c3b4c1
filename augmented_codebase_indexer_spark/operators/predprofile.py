"""Predicate cardinality profile — per-predicate functionality and
cardinality statistics over a (subj, pred, obj) fact table.

The AMIE functionality measure (Galárraga WWW'13 §4, also Suchanek's
YAGO QA suite): ``fun(p) = #subjects(p) / #facts(p)`` — 1.0 means every
subject has exactly one object (a functional predicate: birth_date,
capital_of), low values mean wide fan-out (works_at over a career).
Its inverse (#objects/#facts) flags inverse-functional predicates —
the identifying properties entity resolution keys on (email_of,
isbn). ``max_objs_per_subj`` is the hard cardinality ceiling the
SHACL-lite gate (`operators/kgquality.py`) wants as evidence before
declaring a predicate functional: the profile is the MEASUREMENT, the
constraint table is the POLICY.

Everything is counts over the deduped fact table plus truncating
micro divisions — BIGINT by construction. Facts dedup first (a KG
fact table may carry provenance duplicates; cardinality is over the
asserted relation, not its citations).

Scale shape at 10^11 facts: one distinct at (s,p,o), one (pred, subj)
aggregate (map-side combined — object ids die there), one pred-keyed
fold at predicate-vocabulary grain. No window, no join.

Reference anchor: the reference profiles symbol tables per kind before
indexing (`core/symbols`); this is the KG-grain form of the same
pre-flight statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def predicate_profile(facts: DataFrame) -> DataFrame:
    """(subj, pred, obj) → one row per predicate:
    (pred, n_facts, n_subjects, n_objects, functionality_micro,
    inv_functionality_micro, max_objs_per_subj, functional_evidence)."""
    f = facts.select("subj", "pred", "obj").distinct()
    per_subj = f.groupBy("pred", "subj").agg(
        F.count("*").cast("long").alias("n_objs"),
    )
    subj_side = per_subj.groupBy("pred").agg(
        F.sum("n_objs").alias("n_facts"),
        F.count("*").cast("long").alias("n_subjects"),
        F.max("n_objs").alias("max_objs_per_subj"),
    )
    obj_side = (
        f.select("pred", "obj").distinct()
        .groupBy("pred")
        .agg(F.count("*").cast("long").alias("n_objects"))
    )
    return (
        subj_side.join(obj_side, "pred")
        .selectExpr(
            "pred", "n_facts", "n_subjects", "n_objects",
            f"n_subjects * {MICRO} DIV n_facts AS functionality_micro",
            f"n_objects * {MICRO} DIV n_facts AS inv_functionality_micro",
            "max_objs_per_subj",
            "max_objs_per_subj = 1 AS functional_evidence",
        )
    )


def predicate_profile_oracle_sql(facts_sql: str) -> str:
    """DuckDB mirror of :func:`predicate_profile`."""
    return f"""
    WITH f AS (SELECT DISTINCT subj, pred, obj FROM ({facts_sql})),
    per_subj AS (
      SELECT pred, subj, CAST(count(*) AS BIGINT) AS n_objs
      FROM f GROUP BY pred, subj),
    subj_side AS (
      SELECT pred, sum(n_objs) AS n_facts,
             CAST(count(*) AS BIGINT) AS n_subjects,
             max(n_objs) AS max_objs_per_subj
      FROM per_subj GROUP BY pred),
    obj_side AS (
      SELECT pred, CAST(count(*) AS BIGINT) AS n_objects
      FROM (SELECT DISTINCT pred, obj FROM f) GROUP BY pred)
    SELECT s.pred, s.n_facts, s.n_subjects, o.n_objects,
           s.n_subjects * {MICRO} // s.n_facts AS functionality_micro,
           o.n_objects * {MICRO} // s.n_facts AS inv_functionality_micro,
           s.max_objs_per_subj,
           s.max_objs_per_subj = 1 AS functional_evidence
    FROM subj_side s JOIN obj_side o ON s.pred = o.pred
    """
