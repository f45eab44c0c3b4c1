"""Phrase search (operators/phrase.py): consecutive-token semantics,
overlap counting, punctuation/case folding, zero-shuffle plan, and
DuckDB parity."""

import pytest

from augmented_codebase_indexer_spark.operators.phrase import (
    phrase_match,
    phrase_match_sql,
)

DOCS = [
    (1, "the quick brown fox jumps over the quick brown dog"),
    (2, "Quick, brown?? FOX!"),          # case + punctuation fold
    (3, "quick fox brown"),              # tokens present, order wrong
    (4, "a a a a"),                      # overlapping matches
    (5, "quick"),                        # shorter than the phrase
    (6, ""),                             # empty
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_consecutive_semantics_and_positions(spark):
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match(_df(spark), "quick brown").collect()
    }
    assert got == {1: (2, 2), 2: (1, 1)}  # doc 3: wrong order; 5/6: short


def test_overlapping_occurrences_count(spark):
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match(_df(spark), "a a").collect()
    }
    assert got == {4: (3, 1)}  # positions 1,2,3 — overlap counted


def test_single_token_and_empty_phrase(spark):
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match(_df(spark), "quick").collect()
    }
    assert got == {1: 2, 2: 1, 3: 1, 5: 1}
    with pytest.raises(ValueError, match="no indexable tokens"):
        phrase_match(_df(spark), "?!")


def test_zero_shuffle_plan(spark):
    plan = (
        phrase_match(_df(spark), "quick brown")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_duckdb_parity(spark):
    import duckdb

    lit = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in DOCS if "'" not in t
    )
    for phrase in ("quick brown", "a a", "quick", "the quick brown"):
        got = sorted(map(tuple, phrase_match(_df(spark), phrase).collect()))
        want = sorted(
            map(
                tuple,
                duckdb.connect().execute(phrase_match_sql(phrase, lit)).fetchall(),
            )
        )
        assert got == want, phrase
