"""RAKE keyphrases (operators/rake.py): hand-computed scores on the
paper-style example, run segmentation, repeated-phrase collapse,
doc-locality, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.rake import (
    rake_keyphrases,
    rake_keyphrases_oracle_sql,
)

MICRO = 1_000_000


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_scores(spark):
    # "deep learning is the deep end" with stopwords {is, the}:
    # runs: [deep learning], [deep end]
    # freq: deep 2, learning 1, end 1; deg: deep 2+2=4, learning 2, end 2
    # w_score: deep 2e6, learning 2e6, end 2e6
    # phrase scores: 'deep learning' 4e6, 'deep end' 4e6
    rows = {
        r["phrase"]: r
        for r in rake_keyphrases(
            _df(spark, [(1, "deep learning is the deep end")])
        ).collect()
    }
    assert set(rows) == {"deep learning", "deep end"}
    assert rows["deep learning"]["score_micro"] == 4 * MICRO
    assert rows["deep end"]["score_micro"] == 4 * MICRO
    assert rows["deep learning"]["n_words"] == 2


def test_single_words_and_punctuation_boundaries(spark):
    # punctuation splits runs exactly like stopwords do
    rows = {
        r["phrase"]: r
        for r in rake_keyphrases(
            _df(spark, [(1, "red widgets, blue widgets")])
        ).collect()
    }
    # freq: widgets 2, red 1, blue 1; deg: widgets 4, red 2, blue 2
    assert rows["red widgets"]["score_micro"] == 2 * MICRO + 2 * MICRO
    assert set(rows) == {"red widgets", "blue widgets"}


def test_repeated_phrase_collapses(spark):
    rows = rake_keyphrases(
        _df(spark, [(1, "alpha beta and alpha beta")])).collect()
    assert len(rows) == 1
    assert rows[0]["n_occurrences"] == 2 and rows[0]["phrase"] == "alpha beta"


def test_doc_locality(spark):
    # the same phrase in two docs scores from each doc's own stats
    rows = rake_keyphrases(_df(spark, [
        (1, "solar panels"), (2, "solar panels for solar farms"),
    ])).collect()
    by = {(r["doc_id"], r["phrase"]): r["score_micro"] for r in rows}
    assert by[(1, "solar panels")] == 4 * MICRO     # both words deg2/freq1
    # doc 2: solar freq2 deg4 → 2e6; panels freq1 deg2 → 2e6; farms 2e6
    assert by[(2, "solar panels")] == 4 * MICRO
    assert by[(2, "solar farms")] == 4 * MICRO


def test_matches_duckdb_oracle(spark):
    rows = [
        (1, "Deep learning is the deep end of machine learning"),
        (2, "red widgets, blue widgets and GREEN widgets"),
        (3, "a the of"),  # all stopwords → no phrases
    ]
    d_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in rows)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(rake_keyphrases_oracle_sql(d_sql)).fetchall()
    )
    got = sorted(
        tuple(r) for r in rake_keyphrases(_df(spark, rows)).collect())
    assert got == want and len(got) > 0
    assert not any(r[0] == 3 for r in got)
