"""Mutual best match (operators/mutualbest.py): reciprocity gate, hub
rejection, tie determinism, similarity mode, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.mutualbest import (
    mutual_best_matches,
    mutual_best_matches_oracle_sql,
)

# hub h is everyone's near neighbor, but h's own best is m
CANDS = [
    ("a", "h", 2), ("b", "h", 2), ("h", "m", 1),
    ("c", "d", 1), ("c", "e", 3),      # c<->d reciprocal
    ("x", "y", 5), ("x", "z", 5),      # x ties: dst text picks y
    ("y", "z", 9),
]


def _df(spark):
    return spark.createDataFrame(
        CANDS, "id_a string, id_b string, dist long")


def test_reciprocity_and_hub_rejection(spark):
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in mutual_best_matches(_df(spark)).collect()}
    # a and b both want h, but h wants m -> only (h, m) survives
    assert got == {
        ("h", "m"): 1,
        ("c", "d"): 1,
        ("x", "y"): 5,  # x's tie broke to y; y's best is x (5 < 9)
    }


def test_similarity_mode(spark):
    sims = spark.createDataFrame(
        [("a", "b", 90), ("a", "c", 10), ("b", "c", 20)],
        "id_a string, id_b string, dist long")
    got = {(r["id_a"], r["id_b"])
           for r in mutual_best_matches(sims, ascending=False).collect()}
    assert got == {("a", "b")}


def test_matches_duckdb_oracle(spark):
    c_sql = " UNION ALL ".join(
        f"SELECT '{a}' AS id_a, '{b}' AS id_b, {s} AS dist"
        for a, b, s in CANDS)
    for asc in (True, False):
        want = sorted(tuple(r) for r in duckdb.connect().execute(
            mutual_best_matches_oracle_sql(c_sql, ascending=asc)).fetchall())
        got = sorted(tuple(r) for r in mutual_best_matches(
            _df(spark), ascending=asc).collect())
        assert got == want, asc
