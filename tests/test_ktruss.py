"""k-truss (operators/graphalgs.py::k_truss): clique survives, the
two-round cascade peel, k<3 rejected, DuckDB parity."""

import itertools

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.graphalgs import (
    k_truss,
    k_truss_oracle_sql,
)

K5 = [(f"k{i}", f"k{j}") for i, j in itertools.combinations(range(5), 2)]
# two triangles sharing edge (a,b): (a,b) has support 2 in round 1,
# but once the side edges peel its support collapses — a 2-round peel
CASCADE = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]


def _df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_clique_is_a_truss(spark):
    got = {(r["a"], r["b"]): r["support"]
           for r in k_truss(_df(spark, K5), k=5).collect()}
    assert len(got) == 10 and set(got.values()) == {3}


def test_cascade_peels_to_empty(spark):
    # k=4 needs support>=2: side edges (sup 1) peel in round 1, which
    # strands (a,b) (sup 2 -> 0) in round 2
    assert k_truss(_df(spark, CASCADE), k=4).count() == 0


def test_k2_rejected(spark):
    with pytest.raises(ValueError):
        k_truss(_df(spark, K5), k=2)


def test_matches_duckdb_oracle(spark):
    edges = K5 + CASCADE + [("k0", "a"), ("x", "y")]
    e_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS src, '{d}' AS dst" for s, d in edges)
    for k in (3, 4, 5):
        want = sorted(tuple(r) for r in duckdb.connect().execute(
            k_truss_oracle_sql(e_sql, k=k, rounds=6)).fetchall())
        got = sorted(tuple(r)
                     for r in k_truss(_df(spark, edges), k=k).collect())
        assert got == want, k
