"""Type propagation (operators/typeprop.py): hop-by-round spread,
majority + deterministic tie-break, seed clamping, horizon cutoff,
DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.typeprop import (
    propagate_types,
    propagate_types_oracle_sql,
)

EDGES = [
    ("s", "u1"), ("u1", "u2"), ("u2", "u3"), ("u3", "u4"),  # 4-hop chain
    ("p1", "m"), ("o1", "m"),                 # tie: person vs org
    ("p1", "mm"), ("p2", "mm"), ("o1", "mm"),  # majority person 2-1
    ("o1", "p1"),                              # seed-seed edge: clamped
]
SEEDS = [("s", "person"), ("p1", "person"), ("p2", "person"),
         ("o1", "org")]


def _dfs(spark):
    return (spark.createDataFrame(EDGES, "a string, b string"),
            spark.createDataFrame(SEEDS, "entity string, type string"))


def test_propagation(spark):
    e, s = _dfs(spark)
    got = {r["entity"]: (r["type"], r["round_assigned"])
           for r in propagate_types(e, s, rounds=3).collect()}
    assert got == {
        "s": ("person", 0), "p1": ("person", 0), "p2": ("person", 0),
        "o1": ("org", 0),
        "u1": ("person", 1),
        "m": ("org", 1),       # 1-1 tie breaks on type text
        "mm": ("person", 1),   # 2-1 majority
        "u2": ("person", 2),
        "u3": ("person", 3),
        # u4 is 4 hops out: beyond the horizon, honestly absent
    }


def test_matches_duckdb_oracle(spark):
    e, s = _dfs(spark)
    e_sql = " UNION ALL ".join(
        f"SELECT '{a}' AS a, '{b}' AS b" for a, b in EDGES)
    s_sql = " UNION ALL ".join(
        f"SELECT '{en}' AS entity, '{t}' AS type" for en, t in SEEDS)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        propagate_types_oracle_sql(e_sql, s_sql, rounds=3)).fetchall())
    got = sorted(tuple(r) for r in propagate_types(e, s, rounds=3).collect())
    assert got == want and len(got) == 9
