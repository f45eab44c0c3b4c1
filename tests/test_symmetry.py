"""Symmetry violations (operators/kgquality.py::symmetry_violations):
one-directional symmetric facts flagged, mirrored/self-loop/other-pred
facts not, duplicate collapse, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.kgquality import (
    symmetry_violations,
    symmetry_violations_sql,
)

TRIPLES = [
    ("a", "spouse", "b"), ("b", "spouse", "a"),   # mirrored → clean
    ("c", "spouse", "d"),                          # one-way → violation
    ("c", "spouse", "d"),                          # dup collapses
    ("e", "spouse", "e"),                          # self-loop → ignored
    ("x", "works_at", "y"),                        # not symmetric → ignored
    ("p", "sibling", "q"),                         # one-way, 2nd pred
]


def _df(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def test_violations(spark):
    got = sorted(
        tuple(r) for r in symmetry_violations(
            _df(spark), ("spouse", "sibling")).collect()
    )
    assert got == [("sibling", "p", "q"), ("spouse", "c", "d")]


def test_matches_duckdb_oracle(spark):
    t_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in TRIPLES
    )
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(symmetry_violations_sql(t_sql, ("spouse", "sibling")))
        .fetchall()
    )
    got = sorted(
        tuple(r) for r in symmetry_violations(
            _df(spark), ("spouse", "sibling")).collect()
    )
    assert got == want and len(got) == 2
