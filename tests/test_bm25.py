"""BM25 ranked retrieval (operators/bm25.py): exact-integer python-mirror
parity, classic ranking semantics (rare term outranks common, length
normalization penalizes padded docs), determinism, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.bm25 import (
    bm25_oracle_sql,
    bm25_py,
    bm25_search,
)

DOCS = {
    1: "spark joins the window and the window wins",
    2: "spark spark spark common words all day spark",
    3: "a very long document " + "filler words repeated here " * 30 + " spark",
    4: "window",
    5: "nothing relevant at all here",
    6: "",
    # padding docs keep df(spark)=3 strictly under N/2 so its Robertson
    # idf stays positive (df == N/2 → idf exactly 0 and scores vanish)
    7: "completely unrelated content about gardens and trees",
    8: "yet another unrelated document about cooking pasta",
}


def _df(spark):
    return spark.createDataFrame(
        list(DOCS.items()), "doc_id long, text string"
    )


def test_matches_python_mirror(spark):
    got = [tuple(r) for r in bm25_search(_df(spark), ["spark", "window"]).collect()]
    want = bm25_py(DOCS, ["spark", "window"])
    assert got == want


def test_matches_duckdb_oracle(spark):
    con = duckdb.connect()
    docs_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in DOCS.items()
    )
    want = [tuple(r) for r in con.execute(
        bm25_oracle_sql(["spark", "window"], docs_sql=docs_sql)
    ).fetchall()]
    got = [tuple(r) for r in bm25_search(_df(spark), ["spark", "window"]).collect()]
    assert got == want


def test_ranking_semantics(spark):
    rows = {r["doc_id"]: r for r in bm25_search(
        _df(spark), ["spark", "window"]).collect()}
    # docs with no query term are absent
    assert not {5, 6, 7, 8} & set(rows)
    # doc 1 matches both terms; its two-term score beats doc 4's one term
    assert rows[1]["n_hits"] == 2 and rows[4]["n_hits"] == 1
    assert rows[1]["score_micro"] > rows[4]["score_micro"]
    # length normalization: doc 3's single spark in a 150+-token doc
    # scores below doc 4's single-term short doc... compare same-term
    # docs: 3 (spark, long) far below 2 (spark-heavy, short)
    assert rows[3]["score_micro"] < rows[2]["score_micro"]
    # rank is dense 1..n by (score desc, doc_id)
    ordered = sorted(rows.values(), key=lambda r: r["rank"])
    scores = [r["score_micro"] for r in ordered]
    assert scores == sorted(scores, reverse=True)


def test_k_limits_output(spark):
    assert bm25_search(_df(spark), ["spark", "window"], k=2).count() == 2


def test_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_search(_df(spark), [])


def test_common_term_idf_can_go_negative(spark):
    """Robertson idf: a term in > half the docs gets NEGATIVE idf — the
    mirror and both engines must agree on the sign convention."""
    docs = {i: "common text" for i in range(1, 6)}
    docs[9] = "rare common"
    got = {r["doc_id"]: r["score_micro"]
           for r in bm25_search(
               spark.createDataFrame(list(docs.items()),
                                     "doc_id long, text string"),
               ["common", "rare"], k=10).collect()}
    want = {i: s for i, _, s, _ in bm25_py(docs, ["common", "rare"], k=10)}
    assert got == want
    assert any(s < 0 for s in got.values())  # the all-common docs
    assert got[9] == max(got.values())       # 'rare' dominates
