"""Capture-recapture class completeness (operators/completeness.py):
hand Chao1/Good-Turing values, duplicate-capture collapse, the f2=0
bias-corrected branch, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.completeness import (
    class_completeness,
    class_completeness_oracle_sql,
)

MICRO = 1_000_000

SIGHTINGS = [
    # class 'a': capture profile n_src = {1,1,1,1,1,2,3}
    #   -> s_obs=7, N=10, f1=5, f2=1,
    #      chao1 = 7 + 5*4 DIV (2*2) = 12
    ("a", "e1", "s1"), ("a", "e2", "s1"), ("a", "e3", "s2"),
    ("a", "e4", "s2"), ("a", "e5", "s3"),
    ("a", "e6", "s1"), ("a", "e6", "s2"),
    ("a", "e7", "s1"), ("a", "e7", "s2"), ("a", "e7", "s3"),
    # class 'b': every entity by all 3 sources -> f1=f2=0, complete
    ("b", "x1", "s1"), ("b", "x1", "s2"), ("b", "x1", "s3"),
    ("b", "x2", "s1"), ("b", "x2", "s2"), ("b", "x2", "s3"),
    # class 'c': singletons only -> f2=0 branch with f1>0
    #   s_obs=3, N=3, f1=3, chao1 = 3 + 3*2 DIV 2 = 6
    ("c", "y1", "s1"), ("c", "y2", "s1"), ("c", "y3", "s2"),
    # duplicate capture (same class, entity, src) collapses
    ("a", "e1", "s1"),
]


def _df(spark):
    return spark.createDataFrame(
        SIGHTINGS, "class string, entity string, src string")


def test_hand_values(spark):
    rows = {r["class"]: r for r in class_completeness(_df(spark)).collect()}
    a = rows["a"]
    assert (a["s_obs"], a["n_captures"], a["f1"], a["f2"]) == (7, 10, 5, 1)
    assert a["chao1_est"] == 12
    assert a["completeness_micro"] == 7 * MICRO // 12
    assert a["unseen_mass_micro"] == 5 * MICRO // 10
    b = rows["b"]
    assert (b["f1"], b["f2"], b["chao1_est"]) == (0, 0, 2)
    assert b["completeness_micro"] == MICRO
    assert b["unseen_mass_micro"] == 0
    c = rows["c"]  # f2=0 with f1>0: the raw Chao1 would divide by zero
    assert c["chao1_est"] == 6
    assert c["completeness_micro"] == 3 * MICRO // 6


def test_matches_duckdb_oracle(spark):
    s_sql = " UNION ALL ".join(
        f"SELECT '{c}' AS class, '{e}' AS entity, '{s}' AS src"
        for c, e, s in SIGHTINGS)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        class_completeness_oracle_sql(s_sql)).fetchall())
    got = sorted(tuple(r) for r in class_completeness(_df(spark)).collect())
    assert got == want and len(got) == 3
