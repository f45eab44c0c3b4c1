"""Schema drift (operators/schemadrift.py): hand L1 values, new/gone
status, untyped-object exclusion, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.schemadrift import (
    schema_drift,
    schema_drift_oracle_sql,
)

MICRO = 1_000_000

FACTS_A = [
    ("s1", "works_at", "o1"), ("s2", "works_at", "o2"),
    ("s3", "works_at", "o3"),
    ("s1", "lives_in", "c1"),
    ("s9", "works_at", "zz"),      # untyped object: contributes nothing
]
FACTS_B = [
    ("s1", "works_at", "o1"), ("s2", "works_at", "o2"),
    ("s3", "works_at", "d1"),      # range drift: a date where orgs were
    ("s1", "ceo_of", "o1"),        # new predicate
]
TYPES = [
    ("o1", "org"), ("o2", "org"), ("o3", "org"),
    ("c1", "city"), ("d1", "date"),
]


def _dfs(spark):
    sch = "subj string, pred string, obj string"
    return (spark.createDataFrame(FACTS_A, sch),
            spark.createDataFrame(FACTS_B, sch),
            spark.createDataFrame(TYPES, "entity string, type string"))


def test_drift(spark):
    a, b, t = _dfs(spark)
    rows = {r["pred"]: r for r in schema_drift(a, b, t).collect()}
    wa = rows["works_at"]
    assert (wa["n_a"], wa["n_b"], wa["status"]) == (3, 3, "both")
    # A: org 3/3; B: org 2/3 + date 1/3
    assert wa["l1_micro"] == (MICRO - 2 * MICRO // 3) + (MICRO // 3)
    assert rows["lives_in"]["status"] == "gone"
    assert rows["lives_in"]["l1_micro"] is None
    assert rows["ceo_of"]["status"] == "new"
    assert len(rows) == 3


def test_matches_duckdb_oracle(spark):
    a, b, t = _dfs(spark)

    def u(rows, cols):
        return " UNION ALL ".join(
            "SELECT " + ", ".join(f"'{v}' AS {c}" for v, c in zip(r, cols))
            for r in rows)

    want = sorted(tuple(r) for r in duckdb.connect().execute(
        schema_drift_oracle_sql(
            u(FACTS_A, ("subj", "pred", "obj")),
            u(FACTS_B, ("subj", "pred", "obj")),
            u(TYPES, ("entity", "type")))).fetchall())
    got = sorted(tuple(r) for r in schema_drift(a, b, t).collect())
    assert got == want and len(got) == 3
