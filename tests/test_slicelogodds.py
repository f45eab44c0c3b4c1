"""Fightin' Words log-odds (operators/corpusstats.py::slice_log_odds):
sign semantics, shared-vocab densification, python intlog mirror,
DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py
from augmented_codebase_indexer_spark.operators.corpusstats import (
    slice_log_odds,
    slice_log_odds_oracle_sql,
)

DOCS = [
    (0, "spark spark join join table", "a"),
    (1, "spark join table row", "a"),
    (2, "duck duck table row row", "b"),
    (3, "duck table", "b"),
    (4, "ignored entirely", "c"),     # third slice filtered out
]


def _df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, source string")


def _py_delta(tok, counts):
    ca = {"spark": 3, "join": 3, "table": 2, "row": 1, "duck": 0}
    cb = {"spark": 0, "join": 0, "table": 2, "row": 2, "duck": 3}
    V, na, nb = 5, 9, 7
    ya, yb = ca[tok], cb[tok]
    return (ln_micro_py(ya + 1, na + V - ya - 1)
            - ln_micro_py(yb + 1, nb + V - yb - 1))


def test_sign_and_values(spark):
    rows = {r["tok"]: r for r in slice_log_odds(
        _df(spark), "a", "b").collect()}
    assert set(rows) == {"spark", "join", "table", "row", "duck"}
    assert rows["spark"]["delta_micro"] > 0          # a-flavored
    assert rows["duck"]["delta_micro"] < 0           # b-flavored
    for tok in rows:
        assert rows[tok]["delta_micro"] == _py_delta(tok, None), tok
    assert (rows["duck"]["cnt_a"], rows["duck"]["cnt_b"]) == (0, 3)


def test_matches_duckdb_oracle(spark):
    con = duckdb.connect()
    rows_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text, '{s}' AS source"
        for i, t, s in DOCS)
    con.execute(f"CREATE VIEW documents AS {rows_sql}")
    want = sorted(tuple(r) for r in con.execute(
        slice_log_odds_oracle_sql("a", "b")).fetchall())
    got = sorted(tuple(r) for r in slice_log_odds(
        _df(spark), "a", "b").collect())
    assert got == want and len(got) == 5
