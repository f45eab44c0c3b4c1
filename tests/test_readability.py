"""Readability LIX/RIX (operators/readability.py): hand-computed scores,
terminator-run counting, zero-word/zero-sentence guards, band cuts,
DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.readability import (
    readability_oracle_sql,
    readability_scores,
)

DOCS = [
    # 8 words, 2 sentences, 4 long (≥7 chars: meridian, cluster,
    # pipeline, shuffles): LIX = 4 + 100·4/8 = 54 → hard
    (0, "the meridian cluster runs. the pipeline shuffles data."),
    # no terminator → 1 sentence; 4 words, 0 long: LIX = 4 → very_easy
    (1, "a b c d"),
    # '...' is ONE terminator run; 2 words, 2 long: LIX = 2 + 100 = 102
    (2, "ellipsis... trailing..."),
    # zero words → NULL scores, row kept
    (3, ""),
    # dense long words, one sentence: 3 words 3 long → 3 + 100 = 103
    (4, "wherefore presently notwithstanding"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_hand_computed(spark):
    rows = {r["doc_id"]: r for r in readability_scores(_df(spark)).collect()}
    r0 = rows[0]
    assert (r0["n_words"], r0["n_sents"], r0["n_long"]) == (8, 2, 4)
    assert r0["lix_micro"] == 8 * 1_000_000 // 2 + 4 * 100_000_000 // 8
    assert r0["lix_band"] == "hard"
    assert rows[1]["n_sents"] == 1 and rows[1]["lix_micro"] == 4_000_000
    assert rows[1]["lix_band"] == "very_easy"
    # '...' runs: doc 2 has exactly 2 terminator runs, not 6
    assert rows[2]["n_sents"] == 2
    assert rows[2]["lix_band"] == "very_hard"
    assert rows[3]["lix_micro"] is None and rows[3]["lix_band"] is None
    assert rows[4]["rix_micro"] == 3_000_000


def test_matches_duckdb_oracle(spark):
    docs_sql = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, '{t}' AS text" for d, t in DOCS
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(readability_oracle_sql(f"({docs_sql})"))
        .fetchall()
    )
    got = sorted(tuple(r) for r in readability_scores(_df(spark)).collect())
    assert got == want and len(got) == 5
