"""Taxonomy closure (operators/traversal.py): min-hop dedup on a
diamond, hop-bound truncation on a chain, cycle termination, and DuckDB
recursive-CTE parity."""

from augmented_codebase_indexer_spark.operators.traversal import (
    taxonomy_closure,
    taxonomy_closure_sql,
)

EDGES = [
    # chain of 4 hops: a->b->c->d->e (a->e is beyond max_hops=3)
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
    # diamond: p->s via q and via r (one row, hops=2)
    ("p", "q"), ("p", "r"), ("q", "s"), ("r", "s"),
    # 2-cycle: must terminate, min-hops keeps the direct edges at 1
    ("u", "v"), ("v", "u"),
]

EXPECTED = {
    ("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("d", "e", 1),
    ("a", "c", 2), ("b", "d", 2), ("c", "e", 2),
    ("a", "d", 3), ("b", "e", 3),          # (a, e) truncated
    ("p", "q", 1), ("p", "r", 1), ("q", "s", 1), ("r", "s", 1),
    ("p", "s", 2),                          # diamond collapsed to one row
    ("u", "v", 1), ("v", "u", 1), ("u", "u", 2), ("v", "v", 2),
}


def _e(spark):
    return spark.createDataFrame(EDGES, "hypo string, hyper string")


def test_closure_min_hops_bound_and_cycles(spark):
    got = {tuple(r) for r in taxonomy_closure(_e(spark), 3).collect()}
    assert got == EXPECTED


def test_oracle_parity(spark):
    import duckdb

    esql = " UNION ALL ".join(
        f"SELECT '{a}' AS hypo, '{b}' AS hyper" for a, b in EDGES)
    got = sorted(map(tuple, taxonomy_closure(_e(spark), 3).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        taxonomy_closure_sql(esql, 3)).fetchall()))
    assert got == want
