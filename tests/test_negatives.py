"""Filtered negative sampling (operators/negatives.py): type-consistent
pools, filtered protocol, determinism/seed sensitivity, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.negatives import (
    negative_samples,
    negative_samples_oracle_sql,
)

TRIPLES = [
    ("alice", "works_at", "acme"),
    ("alice", "works_at", "globex"),  # alice works at BOTH → both filtered
    ("bob", "works_at", "acme"),
    ("carol", "works_at", "initech"),
    ("alice", "born_in", "paris"),
    ("bob", "born_in", "lyon"),
    ("alice", "works_at", "acme"),  # duplicate extraction row collapses
]


def _df(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def test_type_consistent_and_filtered(spark):
    rows = [tuple(r) for r in negative_samples(_df(spark), k=4).collect()]
    works_objs = {"acme", "globex", "initech"}
    born_objs = {"paris", "lyon"}
    for subj, pred, obj, j, neg in rows:
        # pool is the predicate's own object vocabulary
        assert neg in (works_objs if pred == "works_at" else born_objs)
        assert neg != obj
        # filtered protocol: never a true triple
        assert (subj, pred, neg) not in {(s, p, o) for s, p, o in TRIPLES}
    # alice/works_at negatives can only be initech (acme+globex are true)
    alice_w = {neg for s, p, _, _, neg in rows if (s, p) == ("alice", "works_at")}
    assert alice_w <= {"initech"}
    # born_in negatives exist both ways (2-object pool, 4 slots each)
    assert ("alice", "born_in", "paris") not in {(s, p, n) for s, p, _, _, n in rows}


def test_deterministic_and_seed_sensitive(spark):
    a = sorted(tuple(r) for r in negative_samples(_df(spark), k=3).collect())
    b = sorted(
        tuple(r)
        for r in negative_samples(_df(spark).repartition(5), k=3).collect()
    )
    assert a == b
    c = sorted(
        tuple(r) for r in negative_samples(_df(spark), k=3, seed="other").collect()
    )
    assert a != c


def test_distinct_triple_basis(spark):
    # the duplicated (alice, works_at, acme) row must not double slots
    rows = [tuple(r) for r in negative_samples(_df(spark), k=2).collect()]
    keys = [(s, p, o, j) for s, p, o, j, _ in rows]
    assert len(keys) == len(set(keys))


def test_matches_duckdb_oracle(spark):
    triples_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in TRIPLES
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        negative_samples_oracle_sql(triples_sql, k=4)).fetchall())
    got = sorted(tuple(r) for r in negative_samples(_df(spark), k=4).collect())
    assert got == want and len(got) > 0


def test_k_validation(spark):
    with pytest.raises(ValueError):
        negative_samples(_df(spark), k=0)
