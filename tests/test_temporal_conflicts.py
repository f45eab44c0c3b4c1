"""Temporal conflicts (operators/temporal.py::temporal_conflicts):
overlap semantics, disjoint-is-fine, non-functional exclusion, open
intervals, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.temporal import (
    temporal_conflicts,
    temporal_conflicts_oracle_sql,
)

# (subj, pred, obj, valid_from, valid_to)
VERSIONS = [
    # open-ended disagreement -> conflict with NULL overlap_to
    ("e1", "born_in", "paris", 100, None),
    ("e1", "born_in", "rome", 100, None),
    # bounded overlap [150, 200)
    ("e2", "capital_of", "x0", 100, 200),
    ("e2", "capital_of", "x1", 150, None),
    # DISJOINT versions of a functional pred: no conflict
    ("e3", "born_in", "lyon", 100, 200),
    ("e3", "born_in", "nice", 200, None),
    # non-functional pred overlapping: excluded by policy
    ("e4", "works_at", "acme", 100, None),
    ("e4", "works_at", "globex", 100, None),
    # same obj from two sources (identical rows collapse): agreement
    ("e5", "born_in", "oslo", 100, None),
    ("e5", "born_in", "oslo", 100, None),
]
FUNCTIONAL = ("born_in", "capital_of")


def _df(spark):
    return spark.createDataFrame(
        VERSIONS,
        "subj string, pred string, obj string, valid_from long,"
        " valid_to long")


def test_conflicts(spark):
    got = {tuple(r) for r in temporal_conflicts(
        _df(spark), FUNCTIONAL).collect()}
    assert got == {
        ("e1", "born_in", "paris", "rome", 100, None),
        ("e2", "capital_of", "x0", "x1", 150, 200),
    }


def test_matches_duckdb_oracle(spark):
    v_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj,"
        f" CAST({f} AS BIGINT) AS valid_from,"
        f" CAST({'NULL' if t is None else t} AS BIGINT) AS valid_to"
        for s, p, o, f, t in VERSIONS)
    want = sorted(
        tuple(r) for r in duckdb.connect().execute(
            temporal_conflicts_oracle_sql(v_sql, FUNCTIONAL)).fetchall())
    got = sorted(tuple(r) for r in temporal_conflicts(
        _df(spark), FUNCTIONAL).collect())
    assert got == want and len(got) == 2
