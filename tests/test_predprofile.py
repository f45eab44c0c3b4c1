"""Predicate cardinality profile (operators/predprofile.py): hand
functionality values, provenance-duplicate collapse, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.predprofile import (
    predicate_profile,
    predicate_profile_oracle_sql,
)

MICRO = 1_000_000

FACTS = [
    # birth_date: functional — every subject exactly one object
    ("p1", "birth_date", "1970"), ("p2", "birth_date", "1980"),
    ("p3", "birth_date", "1990"),
    # works_at: p1 has 3 employers, p2 has 1 -> fun = 2/4
    ("p1", "works_at", "acme"), ("p1", "works_at", "globex"),
    ("p1", "works_at", "initech"), ("p2", "works_at", "acme"),
    # email_of: inverse-functional — 2 subjects share nothing
    ("p1", "email_of", "a@x"), ("p2", "email_of", "b@x"),
    # provenance duplicate collapses
    ("p1", "email_of", "a@x"),
]


def _df(spark):
    return spark.createDataFrame(FACTS, "subj string, pred string, obj string")


def test_profile(spark):
    prof = {r["pred"]: r for r in predicate_profile(_df(spark)).collect()}
    bd = prof["birth_date"]
    assert bd["n_facts"] == 3 and bd["n_subjects"] == 3
    assert bd["functionality_micro"] == MICRO
    assert bd["functional_evidence"] is True
    wa = prof["works_at"]
    assert wa["n_facts"] == 4 and wa["n_subjects"] == 2
    assert wa["n_objects"] == 3
    assert wa["functionality_micro"] == 2 * MICRO // 4
    assert wa["max_objs_per_subj"] == 3
    assert wa["functional_evidence"] is False
    em = prof["email_of"]
    assert em["n_facts"] == 2  # duplicate collapsed
    assert em["inv_functionality_micro"] == MICRO


def test_matches_duckdb_oracle(spark):
    f_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in FACTS)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        predicate_profile_oracle_sql(f_sql)).fetchall())
    got = sorted(tuple(r) for r in predicate_profile(_df(spark)).collect())
    assert got == want and len(got) == 3
