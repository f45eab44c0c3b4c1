"""Co-citation / coupling (operators/cocitation.py): hand wedge sets,
direction sensitivity, center cap, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.cocitation import (
    cocitation,
    cocitation_oracle_sql,
    coupling,
    coupling_oracle_sql,
)

EDGES = [
    ("c1", "a"), ("c1", "b"), ("c2", "a"), ("c2", "b"),
    ("c3", "a"), ("c3", "x"),
    ("a", "z"), ("b", "z"), ("a", "w"), ("b", "w"), ("b", "v"),
    ("a", "a"),   # self loop: dropped
    ("c1", "a"),  # duplicate edge: deduped
]


def _df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_cocitation(spark):
    got = {(r["a"], r["b"]): tuple(r)[2:]
           for r in cocitation(_df(spark)).collect()}
    assert got == {
        ("a", "b"): (2, 3, 2, 666_666),
        ("a", "x"): (1, 3, 1, 333_333),
        ("w", "z"): (2, 2, 2, 1_000_000),
        ("v", "w"): (1, 1, 2, 500_000),
        ("v", "z"): (1, 1, 2, 500_000),
    }


def test_coupling_is_the_transpose(spark):
    got = {(r["a"], r["b"]): tuple(r)[2:]
           for r in coupling(_df(spark)).collect()}
    assert got == {
        ("c1", "c2"): (2, 2, 2, 1_000_000),
        ("c1", "c3"): (1, 2, 2, 333_333),
        ("c2", "c3"): (1, 2, 2, 333_333),
        ("a", "b"): (2, 2, 3, 666_666),
    }


def test_center_cap(spark):
    # cap 2 drops hub center 'b' (out-degree 3); degrees recompute on
    # the capped graph
    got = {(r["a"], r["b"]): tuple(r)[2:]
           for r in cocitation(_df(spark), max_center_degree=2).collect()}
    assert got == {
        ("a", "b"): (2, 3, 2, 666_666),
        ("a", "x"): (1, 3, 1, 333_333),
        ("w", "z"): (1, 1, 1, 1_000_000),
    }


def test_matches_duckdb_oracle(spark):
    e_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS src, '{d}' AS dst" for s, d in EDGES)
    con = duckdb.connect()
    for op, mirror in ((cocitation, cocitation_oracle_sql),
                       (coupling, coupling_oracle_sql)):
        want = sorted(tuple(r) for r in con.execute(mirror(e_sql)).fetchall())
        got = sorted(tuple(r) for r in op(_df(spark)).collect())
        assert got == want
