"""Path n-grams (operators/navpaths.py): hand trigram counts, per-user
isolation, short-stream exclusion, min_count, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.navpaths import (
    MICRO,
    path_ngrams,
    path_ngrams_oracle_sql,
)

# (event_id, ts-as-long-for-simplicity, user_id, event_type)
EVENTS = [
    (1, 10, 1, "view"), (2, 20, 1, "click"), (3, 30, 1, "error"),
    (4, 40, 1, "view"), (5, 50, 1, "click"), (6, 60, 1, "error"),
    (7, 10, 2, "view"), (8, 20, 2, "click"), (9, 30, 2, "buy"),
    (10, 10, 3, "view"), (11, 20, 3, "click"),  # too short for n=3
]


def _df(spark):
    return spark.createDataFrame(
        EVENTS, "event_id long, ts long, user_id long, event_type string")


def test_trigrams(spark):
    got = {(r["e1"], r["e2"], r["e3"]): (r["n_paths"], r["share_micro"])
           for r in path_ngrams(_df(spark)).collect()}
    # user1: view,click,error,view,click,error -> 4 windows;
    # user2: 1 window; user3: none. total 5
    assert got == {
        ("view", "click", "error"): (2, 2 * MICRO // 5),
        ("click", "error", "view"): (1, MICRO // 5),
        ("error", "view", "click"): (1, MICRO // 5),
        ("view", "click", "buy"): (1, MICRO // 5),
    }


def test_min_count(spark):
    got = {(r["e1"], r["e2"], r["e3"])
           for r in path_ngrams(_df(spark), min_count=2).collect()}
    assert got == {("view", "click", "error")}


def test_matches_duckdb_oracle(spark):
    e_sql = " UNION ALL ".join(
        f"SELECT {i} AS event_id, {t} AS ts, {u} AS user_id,"
        f" '{ty}' AS event_type"
        for i, t, u, ty in EVENTS)
    for n in (2, 3):
        want = sorted(tuple(r) for r in duckdb.connect().execute(
            path_ngrams_oracle_sql(e_sql, n=n)).fetchall())
        got = sorted(tuple(r)
                     for r in path_ngrams(_df(spark), n=n).collect())
        assert got == want, n
