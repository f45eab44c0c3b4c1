"""Basic-graph-pattern matching over the (subj, pred, obj) triple table —
the core of a SPARQL WHERE clause (Pérez-Arenas-Gutierrez, TODS'09 §2:
BGP semantics = the natural join of the per-pattern bindings, bag
semantics), evaluated as plain Catalyst equi-joins so the optimizer
reorders/broadcasts them like any other join tree.

The reference answers graph questions imperatively per query
(`src/aci/services/graph_service.py` neighborhood walks); a BGP matcher
is the DECLARATIVE form: users write patterns, the engine plans joins.

Terms starting with ``?`` are variables; anything else is a constant
pushed down as a filter BEFORE the join (so each pattern's scan is
predicate-pruned at the source). Patterns must be CONNECTED — a pattern
sharing no variable with the ones before it would be a cartesian
product, which this operator rejects instead of silently planning
(the 100-TB discipline: cross joins are bugs, not plans). Optional
``neq`` pairs add SPARQL ``FILTER(?a != ?b)`` constraints.

Scale shape: each pattern is a filtered slim projection of the triple
table (subject-hash-bucketed per the north star, so subject-keyed joins
co-locate); join order is left to Catalyst/AQE — selective constant
patterns become broadcast sides automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COLS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _pattern_frame(triples: DataFrame, pat: tuple[str, str, str]) -> tuple[DataFrame, list[str]]:
    """One pattern → (bindings frame with one column per DISTINCT var,
    vars in subj/pred/obj order). Repeated vars inside one pattern
    constrain equality before projecting."""
    f = triples
    seen: dict[str, str] = {}
    for col, term in zip(_COLS, pat):
        if _is_var(term):
            v = term[1:]
            if not v:
                raise ValueError(f"bgp_match: bare '?' in pattern {pat}")
            if v in seen:
                f = f.filter(F.col(col) == F.col(seen[v]))
            else:
                seen[v] = col
        else:
            f = f.filter(F.col(col) == F.lit(term))
    out = f.select(*(F.col(c).alias(v) for v, c in seen.items()))
    return out, list(seen)


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    neq: list[tuple[str, str]] | None = None,
    distinct: bool = False,
) -> DataFrame:
    """→ one column per variable (first-appearance order): all variable
    bindings satisfying every pattern (bag semantics, the SPARQL
    default; ``distinct=True`` for set). ``neq`` = [('a','b'), ...]
    inequality filters applied after the joins."""
    if not patterns:
        raise ValueError("bgp_match: empty pattern list")
    acc: DataFrame | None = None
    order: list[str] = []
    for pat in patterns:
        frame, vars_ = _pattern_frame(triples, pat)
        if not vars_:
            raise ValueError(f"bgp_match: pattern {pat} binds no variable")
        if acc is None:
            acc, order = frame, list(vars_)
            continue
        shared = [v for v in vars_ if v in order]
        if not shared:
            raise ValueError(
                f"bgp_match: pattern {pat} shares no variable with the "
                "patterns before it (cartesian product rejected)"
            )
        acc = acc.join(frame, shared)
        order += [v for v in vars_ if v not in order]
    for a, b in neq or []:
        acc = acc.filter(F.col(a) != F.col(b))
    acc = acc.select(*order)
    return acc.distinct() if distinct else acc


def bgp_oracle_sql(
    triples_sql: str,
    patterns: list[tuple[str, str, str]],
    neq: list[tuple[str, str]] | None = None,
    distinct: bool = False,
) -> str:
    """DuckDB mirror: the same filtered-projection-per-pattern join tree."""
    sel: dict[str, str] = {}
    order: list[str] = []
    joins: list[str] = []
    wheres: list[str] = []
    for i, pat in enumerate(patterns):
        alias = f"t{i}"
        conds: list[str] = []
        local: dict[str, str] = {}
        for col, term in zip(_COLS, pat):
            if _is_var(term):
                v = term[1:]
                if v in local:
                    conds.append(f"{alias}.{col} = {alias}.{local[v]}")
                else:
                    local[v] = col
            else:
                lit = term.replace("'", "''")
                conds.append(f"{alias}.{col} = '{lit}'")
        on: list[str] = []
        for v, col in local.items():
            if v in sel:
                on.append(f"{alias}.{col} = {sel[v]}")
            else:
                sel[v] = f"{alias}.{col}"
                order.append(v)
        if i == 0:
            joins.append(f"({triples_sql}) {alias}")
            wheres += conds
        else:
            joins.append(
                f"JOIN ({triples_sql}) {alias} ON "
                + " AND ".join(on + conds)
            )
    for a, b in neq or []:
        wheres.append(f"{sel[a]} <> {sel[b]}")
    cols = ", ".join(f"{sel[v]} AS {v}" for v in order)
    kw = "DISTINCT " if distinct else ""
    where = ("WHERE " + " AND ".join(wheres)) if wheres else ""
    return f"SELECT {kw}{cols} FROM {' '.join(joins)} {where}"
