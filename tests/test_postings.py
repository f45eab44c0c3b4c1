"""Positional postings + proximity search (operators/postings.py):
hand-checked minimal spans, window boundary, position cap determinism,
single-term edge, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.postings import (
    positional_postings,
    proximity_oracle_sql,
    proximity_search,
)

DOCS = [
    (1, "alpha beta gamma alpha zeta beta"),   # both spans; minimal a@3,b@5
    (2, "alpha x x x x x x x beta"),            # span 9: outside window 8
    (3, "beta alpha"),                          # reversed order still matches
    (4, "alpha only here"),                     # missing beta
    (5, "beta beta beta"),                      # missing alpha
    (6, "x alpha beta x alpha x beta"),         # minimal span is (1,2)
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings_positions(spark):
    got = sorted(
        tuple(r) for r in positional_postings(
            spark.createDataFrame([(7, "A  b! a")], "doc_id long, text string")
        ).collect()
    )
    # punctuation/double-space collapse; positions index non-empty tokens
    assert got == [("a", 7, 0), ("a", 7, 2), ("b", 7, 1)]


def test_minimal_spans_exact(spark):
    got = {r["doc_id"]: (r["span_start"], r["span_len"])
           for r in proximity_search(_df(spark), ["alpha", "beta"],
                                     window=8).collect()}
    # doc1: alpha@{0,3}, beta@{1,5} → minimal span alpha@0,beta@1 = (0,2)
    assert got == {1: (0, 2), 3: (0, 2), 6: (1, 2)}
    # doc2 span 9 > window 8 → absent; widen the window and it appears
    wide = {r["doc_id"]: (r["span_start"], r["span_len"])
            for r in proximity_search(_df(spark), ["alpha", "beta"],
                                      window=9).collect()}
    assert wide[2] == (0, 9)


def test_single_term(spark):
    got = {r["doc_id"]: (r["span_start"], r["span_len"], r["n_terms"])
           for r in proximity_search(_df(spark), ["beta"]).collect()}
    assert got[5] == (0, 1, 1) and got[1] == (1, 1, 1)
    assert 4 not in got


def test_position_cap_is_deterministic(spark):
    """A doc whose term repeats past the cap keeps its LOWEST positions —
    the minimal span near the front survives capping."""
    text = "alpha " + "filler " * 5 + ("beta " * 60)
    df = spark.createDataFrame([(9, text)], "doc_id long, text string")
    got = proximity_search(df, ["alpha", "beta"], window=8,
                           max_positions=3).collect()
    assert [(r["span_start"], r["span_len"]) for r in got] == [(0, 7)]


def test_empty_query_raises(spark):
    with pytest.raises(ValueError):
        proximity_search(_df(spark), [])


def test_duckdb_parity(spark):
    docs_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in DOCS
    )
    for terms, w in ((["alpha", "beta"], 8), (["beta"], 4),
                     (["alpha", "beta", "gamma"], 6)):
        got = sorted(map(tuple, proximity_search(
            _df(spark), terms, window=w).collect()))
        want = sorted(map(tuple, duckdb.connect().execute(
            proximity_oracle_sql(terms, window=w, docs_sql=docs_sql)
        ).fetchall()))
        assert got == want, (terms, w)


def test_snippet_search_extracts_context(spark):
    from augmented_codebase_indexer_spark.operators.postings import (
        snippet_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc spark dd join ee ff gg"),
            (2, "spark join at the very start"),
            (3, "ends with spark then join"),
            (4, "no match here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in snippet_search(
        docs, ["spark", "join"], window=8, context=2).collect()}
    # doc 1: span [3, 6) widened 2 each side → tokens 1..7
    assert got[1]["snippet"] == "bb cc spark dd join ee ff"
    # doc 2: span starts at 0 → left clamp
    assert got[2]["snippet"] == "spark join at the"
    # doc 3: span ends at the last token → right clamp
    assert got[3]["snippet"] == "ends with spark then join"
    assert 4 not in got


def test_snippet_matches_duckdb_oracle(spark):
    import duckdb

    from augmented_codebase_indexer_spark.operators.postings import (
        snippet_oracle_sql,
        snippet_search,
    )

    rows = [
        (1, "aa bb cc spark dd join ee ff gg"),
        (2, "spark join at the very start"),
        (3, "ends with spark then join"),
    ]
    docs_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in rows
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(snippet_oracle_sql(
        ["spark", "join"], window=8, context=2, docs_sql=docs_sql
    )).fetchall())
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in snippet_search(
        docs, ["spark", "join"], window=8, context=2).collect())
    assert got == want


def test_first_occurrence_snippets(spark):
    from augmented_codebase_indexer_spark.operators.postings import (
        first_occurrence_snippets,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb spark cc dd"), (2, "join at start"), (3, "no hit")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in first_occurrence_snippets(
        docs, ["spark", "join"], context=2).collect()}
    assert got[1]["snippet"] == "aa bb spark cc dd" and got[1]["pos"] == 2
    assert got[2]["snippet"] == "join at start" and got[2]["pos"] == 0
    assert 3 not in got
