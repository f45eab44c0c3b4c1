"""Unigram entropy (operators/entropy.py): hand values vs ln_micro_py,
uniform = max, single-token degenerate, repetition vs prose ordering,
DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py
from augmented_codebase_indexer_spark.operators.entropy import (
    unigram_entropy,
    unigram_entropy_oracle_sql,
)

MICRO = 1_000_000


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_values(spark):
    rows = {r["doc_id"]: r for r in unigram_entropy(_df(spark, [
        (1, "a b c d"),          # uniform over 4 → H = ln 4, eff = 1e6
        (2, "x x x x"),          # one distinct → H = 0, eff = 0
        (3, "w w z"),            # H = ln3 − (2·ln2)/3
    ])).collect()}
    ln = lambda n: ln_micro_py(n, 1)  # noqa: E731
    d1 = rows[1]
    assert d1["n_tokens"] == 4 and d1["n_distinct"] == 4
    assert d1["entropy_micro"] == ln(4)
    assert d1["efficiency_micro"] == ln(4) * MICRO // ln(4)
    d2 = rows[2]
    assert d2["entropy_micro"] == ln(4) - (4 * ln(4)) // 4
    assert d2["entropy_micro"] == 0 and d2["efficiency_micro"] == 0
    d3 = rows[3]
    assert d3["entropy_micro"] == ln(3) - (2 * ln(2)) // 3
    assert 0 < d3["efficiency_micro"] < MICRO


def test_repetition_scores_below_prose(spark):
    rows = {r["doc_id"]: r["efficiency_micro"]
            for r in unigram_entropy(_df(spark, [
                (1, "buy cheap pills buy cheap pills buy cheap pills"),
                (2, "the quick brown fox jumps over a lazy dog today"),
            ])).collect()}
    assert rows[1] < rows[2]
    assert rows[2] == MICRO  # all-distinct prose is maximal


def test_empty_docs_absent(spark):
    got = unigram_entropy(_df(spark, [(1, "..."), (2, "ok")])).collect()
    assert [r["doc_id"] for r in got] == [2]


def test_matches_duckdb_oracle(spark):
    rows = [
        (1, "Alpha beta gamma alpha ALPHA beta"),
        (2, "one two three, four five; six one"),
        (3, "solo"),
    ]
    d_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in rows)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(unigram_entropy_oracle_sql(d_sql)).fetchall()
    )
    got = sorted(
        tuple(r) for r in unigram_entropy(_df(spark, rows)).collect())
    assert got == want and len(got) == 3
