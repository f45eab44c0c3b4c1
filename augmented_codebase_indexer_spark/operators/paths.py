"""Property-path evaluation — SPARQL 1.1 property-path algebra over the
fact table, compiled to DataFrame ops and, in parallel, to oracle SQL.

The query capability between single-pattern lookup and full BGP
matching (`operators/bgp.py`): SPARQL property paths (W3C SPARQL 1.1
§9) express relation COMPOSITION — ``works_at/partOf`` (employer's
parent), ``works_at/^works_at`` (coworkers), ``partOf+`` (ancestors)
— as an algebra over (subj, obj) pair sets. Paths are given as a tiny
AST of nested tuples:

    ('pred', name)     one predicate's pairs
    ('inv', p)         inverse (^p): swap ends
    ('seq', a, b)      composition (a/b): join a.obj = b.subj
    ('alt', a, b)      alternation (a|b): set union
    ('plus', p, k)     BOUNDED closure (p{1,k}): ≤ k hops

and the same AST compiles to BOTH engines — the Spark builder emits
joins/unions, the SQL builder emits the identical algebra as nested
subqueries — so arbitrary path expressions stay oracle-gated without
hand-writing a mirror per query. Set semantics throughout (DISTINCT
after every combinator), matching SPARQL's path-pair semantics.
Closure is bounded by design: the unbounded ``+`` of SPARQL needs a
fixpoint; the reference-grade uses here (org hierarchies, taxonomy
ancestors) have known shallow depth, and the existing
`operators/traversal.py` covers convergence-driven closure with its
own gate.

Scale shape: every combinator is an equi-join or union on slim
(subj, obj) id pairs, co-partitioned on the join key; a k-bounded
plus is k-1 such joins. Predicate selection prunes at the scan.

Reference anchor: the reference's graph service exposes fixed-shape
neighbor expansions (`services/graph_service.py`); this is the
algebraic generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eval_path(facts: DataFrame, path: tuple) -> DataFrame:
    """facts(subj, pred, obj) × path AST → DISTINCT (subj, obj)."""
    op = path[0]
    if op == "pred":
        return (
            facts.filter(F.col("pred") == path[1])
            .select("subj", "obj").distinct()
        )
    if op == "inv":
        p = eval_path(facts, path[1])
        return p.select(F.col("obj").alias("subj"),
                        F.col("subj").alias("obj")).distinct()
    if op == "seq":
        a = eval_path(facts, path[1])
        b = eval_path(facts, path[2])
        return (
            a.join(b.select(F.col("subj").alias("obj"),
                            F.col("obj").alias("_o2")), "obj")
            .select("subj", F.col("_o2").alias("obj")).distinct()
        )
    if op == "alt":
        return (
            eval_path(facts, path[1])
            .unionByName(eval_path(facts, path[2])).distinct()
        )
    if op == "plus":
        base = eval_path(facts, path[1])
        acc, hop = base, base
        for _ in range(path[2] - 1):
            hop = (
                hop.join(base.select(F.col("subj").alias("obj"),
                                     F.col("obj").alias("_o2")), "obj")
                .select("subj", F.col("_o2").alias("obj")).distinct()
            )
            acc = acc.unionByName(hop).distinct()
        return acc
    raise ValueError(f"unknown path op: {op!r}")


def eval_path_sql(facts_sql: str, path: tuple) -> str:
    """Compile the SAME AST to DuckDB SQL returning DISTINCT
    (subj, obj) — structurally the mirror of :func:`eval_path`."""
    op = path[0]
    if op == "pred":
        return (f"SELECT DISTINCT subj, obj FROM ({facts_sql})"
                f" WHERE pred = '{path[1]}'")
    if op == "inv":
        return (f"SELECT DISTINCT obj AS subj, subj AS obj"
                f" FROM ({eval_path_sql(facts_sql, path[1])})")
    if op == "seq":
        a = eval_path_sql(facts_sql, path[1])
        b = eval_path_sql(facts_sql, path[2])
        return (f"SELECT DISTINCT a.subj, b.obj FROM ({a}) a"
                f" JOIN ({b}) b ON a.obj = b.subj")
    if op == "alt":
        return (f"SELECT DISTINCT subj, obj FROM ("
                f"{eval_path_sql(facts_sql, path[1])}"
                f" UNION {eval_path_sql(facts_sql, path[2])})")
    if op == "plus":
        base = eval_path_sql(facts_sql, path[1])
        hops = [f"h1 AS MATERIALIZED ({base})"]
        for i in range(2, path[2] + 1):
            hops.append(
                f"h{i} AS MATERIALIZED ("
                f"SELECT DISTINCT a.subj, b.obj FROM h{i - 1} a"
                f" JOIN h1 b ON a.obj = b.subj)")
        union = " UNION ".join(
            f"SELECT subj, obj FROM h{i}" for i in range(1, path[2] + 1))
        return f"WITH {', '.join(hops)} SELECT DISTINCT subj, obj FROM ({union})"
    raise ValueError(f"unknown path op: {op!r}")
