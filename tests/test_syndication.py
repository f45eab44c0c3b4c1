"""Syndication origins (operators/syndication.py): earliest-fetch
election, same-second doc-id tie-break, transitive clusters, undated
member drop, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.syndication import (
    syndication_origins,
    syndication_origins_sql,
)

# cluster {1,2,3} via chain 1-2, 2-3 (transitive); doc 2 earliest.
# cluster {10,11} fetched the same second → doc 10 wins by id.
PAIRS = [(1, 2), (2, 3), (10, 11)]
FETCHES = [(1, 500), (2, 100), (3, 900), (10, 42), (11, 42)]


def _dfs(spark, fetches=FETCHES):
    p = spark.createDataFrame(PAIRS, "a long, b long")
    f = spark.createDataFrame(fetches, "doc_id long, fetched_epoch long")
    return p, f


def test_election_and_ties(spark):
    p, f = _dfs(spark)
    rows = {r["doc_id"]: r for r in syndication_origins(p, f).collect()}
    assert rows[1]["origin"] == 2 and rows[1]["lag_sec"] == 400
    assert rows[3]["origin"] == 2 and rows[3]["lag_sec"] == 800
    assert rows[2]["is_origin"] is True and rows[2]["lag_sec"] == 0
    assert rows[10]["is_origin"] is True    # id tie-break
    assert rows[11]["origin"] == 10 and rows[11]["lag_sec"] == 0
    # the two clusters are distinct components
    assert rows[1]["component"] != rows[10]["component"]


def test_undated_member_drops_but_cluster_stays(spark):
    p, f = _dfs(spark, fetches=[(1, 500), (2, 100), (10, 42), (11, 42)])
    rows = {r["doc_id"]: r for r in syndication_origins(p, f).collect()}
    assert 3 not in rows                    # undated doc absent
    assert rows[1]["origin"] == 2           # election still honest


def test_matches_duckdb_oracle(spark):
    p, f = _dfs(spark)
    p_sql = " UNION ALL ".join(
        f"SELECT {a} AS a, {b} AS b" for a, b in PAIRS)
    f_sql = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, {e} AS fetched_epoch" for d, e in FETCHES)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(syndication_origins_sql(p_sql, f_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in syndication_origins(p, f).collect())
    assert got == want and len(got) == 5
