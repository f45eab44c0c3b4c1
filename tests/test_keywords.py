"""TF-IDF keywords (operators/keywords.py): hand-computed scores,
rare-beats-common semantics, tie-breaks, DuckDB parity on driver data,
and the semantic guard on the r6 libm-free idf quantization."""

import math

from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py
from augmented_codebase_indexer_spark.operators.keywords import (
    tfidf_keywords,
    tfidf_keywords_sql,
)

DOCS = [
    (1, "apple apple common"),
    (2, "banana common common"),
    (3, "common apple zebra"),
]
# N=3; df: apple 2, banana 1, common 3, zebra 1; idf(common)=0


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_rare_beats_common(spark):
    got = {(r["doc_id"], r["rank"]): (r["term"], r["score_micro"])
           for r in tfidf_keywords(_df(spark), k=2).collect()}
    idf = lambda df_: ln_micro_py(3, df_)  # r6: libm-free integer log
    assert got == {
        (1, 1): ("apple", 2 * idf(2)),
        (1, 2): ("common", 0),
        (2, 1): ("banana", idf(1)),
        (2, 2): ("common", 0),
        # doc 3: apple and zebra tie on tf=1? no — zebra idf(1) > apple idf(2)
        (3, 1): ("zebra", idf(1)),
        (3, 2): ("apple", idf(2)),
    }


def test_duckdb_parity_on_driver_corpus(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(map(tuple, tfidf_keywords(docs, k=3).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(tfidf_keywords_sql(k=3)).fetchall()))
    assert got == want


def test_idf_intlog_semantic_guard(spark):
    """r6: idf_micro comes from the libm-free integer log (exactness is
    by construction, parity asserted in test_intlog.py). This guard
    pins the SEMANTICS instead: over every (N, df) pair of the sf0.01
    corpus the integer idf stays within 2 micro-nats of true
    1e6·ln(N/df), and idf(df=N) == 0 exactly."""
    import duckdb

    n = duckdb.connect().execute(
        "SELECT count(DISTINCT doc_id) AS n FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).fetchone()[0]
    assert ln_micro_py(n, n) == 0
    for df_ in range(1, n + 1):
        got = ln_micro_py(n, df_)
        assert abs(got - 1_000_000 * math.log(n / df_)) <= 2, (df_, got)
