"""Synchronous LPA communities (operators/communities.py): two planted
cliques with a bridge resolve to two communities; python-mirror and
DuckDB parity; determinism across parallelism."""

import duckdb

from augmented_codebase_indexer_spark.operators.communities import (
    lpa_communities,
    lpa_oracle_sql,
    lpa_py,
)

# two 4-cliques joined by one bridge edge; labels are strings on purpose
CLIQUE_A = ["a1", "a2", "a3", "a4"]
CLIQUE_B = ["b1", "b2", "b3", "b4"]
EDGES = (
    [(x, y) for x in CLIQUE_A for y in CLIQUE_A if x < y]
    + [(x, y) for x in CLIQUE_B for y in CLIQUE_B if x < y]
    + [("a4", "b1"), ("c1", "c1")]  # bridge + a self-loop to drop
)


def _edges(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_two_cliques_two_communities(spark):
    got = dict(
        (r["node"], r["community"])
        for r in lpa_communities(_edges(spark), rounds=4).collect()
    )
    # each clique converges on its own min label; the self-loop node is gone
    assert len({got[n] for n in CLIQUE_A}) == 1
    assert len({got[n] for n in CLIQUE_B}) == 1
    assert {got[n] for n in CLIQUE_A} != {got[n] for n in CLIQUE_B}
    assert "c1" not in got


def test_matches_python_mirror(spark):
    for rounds in (1, 2, 4):
        got = sorted(
            (r["node"], r["community"])
            for r in lpa_communities(_edges(spark), rounds=rounds).collect()
        )
        assert got == lpa_py(EDGES, rounds=rounds)


def test_matches_duckdb_oracle(spark):
    edges_sql = " UNION ALL ".join(
        f"SELECT '{a}' AS src, '{b}' AS dst" for a, b in EDGES
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        lpa_oracle_sql(edges_sql, rounds=4)).fetchall())
    got = sorted(
        tuple(r) for r in lpa_communities(_edges(spark), rounds=4).collect()
    )
    assert got == want


def test_deterministic_across_parallelism(spark):
    e = _edges(spark)
    a = sorted(tuple(r) for r in lpa_communities(e, rounds=3).collect())
    b = sorted(
        tuple(r)
        for r in lpa_communities(e.repartition(7), rounds=3).collect()
    )
    assert a == b


def test_rounds_bounds(spark):
    import pytest

    with pytest.raises(ValueError):
        lpa_communities(_edges(spark), rounds=0)
    with pytest.raises(ValueError):
        lpa_communities(_edges(spark), rounds=17)
