"""HITS hubs & authorities (operators/hits.py): hub/authority separation
on a planted bipartite-ish graph, python-mirror and DuckDB parity,
dangling directions, determinism."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.hits import (
    hits_py,
    hits_oracle_sql,
    hits_scores,
)

# h1/h2 are pure hubs pointing at shared authorities x/y/z; 'solo' points
# only at x; 'island_src' → 'island_dst' is a weak side component; one
# self-loop and one duplicate edge to drop
EDGES = [
    ("h1", "x"), ("h1", "y"), ("h1", "z"),
    ("h2", "x"), ("h2", "y"), ("h2", "z"),
    ("solo", "x"),
    ("island_src", "island_dst"),
    ("x", "x"),          # self-loop dropped
    ("h1", "x"),         # duplicate collapses
]


def _df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_hub_authority_separation(spark):
    got = {r["node"]: r for r in hits_scores(_df(spark), rounds=3).collect()}
    # pure hubs: max hub score, zero authority (nothing points at them)
    assert got["h1"]["hub_micro"] == got["h2"]["hub_micro"] == 1_000_000
    assert got["h1"]["auth_micro"] == 0
    # x is the strongest authority (3 in-links incl. solo's)
    assert got["x"]["auth_micro"] == 1_000_000
    assert got["x"]["auth_micro"] > got["y"]["auth_micro"] > 0
    assert got["y"]["auth_micro"] == got["z"]["auth_micro"]
    # solo's hub score is below the full hubs' but positive
    assert 0 < got["solo"]["hub_micro"] < 1_000_000
    # pure authorities have zero hub score
    assert got["y"]["hub_micro"] == 0


def test_matches_python_mirror(spark):
    for rounds in (1, 3):
        got = sorted(
            tuple(r) for r in hits_scores(_df(spark), rounds=rounds).collect()
        )
        assert got == hits_py(EDGES, rounds=rounds)


def test_matches_duckdb_oracle(spark):
    edges_sql = " UNION ALL ".join(
        f"SELECT '{a}' AS src, '{b}' AS dst" for a, b in EDGES
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        hits_oracle_sql(edges_sql, rounds=3)).fetchall())
    got = sorted(tuple(r) for r in hits_scores(_df(spark), rounds=3).collect())
    assert got == want


def test_deterministic_across_parallelism(spark):
    e = _df(spark)
    a = sorted(tuple(r) for r in hits_scores(e, rounds=2).collect())
    b = sorted(
        tuple(r) for r in hits_scores(e.repartition(7), rounds=2).collect()
    )
    assert a == b


def test_rounds_validation(spark):
    with pytest.raises(ValueError):
        hits_scores(_df(spark), rounds=0)
