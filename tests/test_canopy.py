"""Canopy blocking (operators/canopy.py): reordered-name recall, df
gate, short-token filter, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.canopy import (
    canopy_candidates,
    canopy_candidates_oracle_sql,
)

NAMES = [
    ("r1", "acme corp"),
    ("r2", "corp acme"),      # reordered: two-end keys miss, canopy hits
    ("r3", "acme holdings"),
    ("r4", "zenith gmbh"),
    ("r5", "a zenith"),       # 'a' is below min_token_len
]


def _df(spark):
    return spark.createDataFrame(NAMES, "id string, name string")


def test_candidates(spark):
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in canopy_candidates(_df(spark)).collect()}
    assert got == {
        ("r1", "r2"): 2,   # share acme AND corp
        ("r1", "r3"): 1, ("r2", "r3"): 1,   # acme
        ("r4", "r5"): 1,   # zenith ('a' filtered)
    }


def test_df_gate_drops_common_tokens(spark):
    # max_df=2: 'acme' (df 3) stops generating pairs; 'corp' (df 2) stays
    got = {(r["id_a"], r["id_b"])
           for r in canopy_candidates(_df(spark), max_df=2).collect()}
    assert got == {("r1", "r2"), ("r4", "r5")}


def test_matches_duckdb_oracle(spark):
    n_sql = " UNION ALL ".join(
        f"SELECT '{i}' AS id, '{n}' AS name" for i, n in NAMES)
    for max_df in (2, 50):
        want = sorted(tuple(r) for r in duckdb.connect().execute(
            canopy_candidates_oracle_sql(n_sql, max_df=max_df)).fetchall())
        got = sorted(tuple(r) for r in canopy_candidates(
            _df(spark), max_df=max_df).collect())
        assert got == want, max_df
