"""Heaps vocabulary growth (operators/vocabgrowth.py): hand curve,
beta via the intlog python mirror, flat-vocab and first-checkpoint
NULL branches, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py
from augmented_codebase_indexer_spark.operators.vocabgrowth import (
    vocab_growth,
    vocab_growth_oracle_sql,
)

MICRO = 1_000_000

DOCS = [
    (0, "a b a"), (1, "b c"),      # ckpt 0: 5 toks, V=3
    (2, "c d"), (3, "d e f"),      # ckpt 1: cum 10 toks, V=6
    (4, "a a a a"),                # ckpt 2: cum 14 toks, V flat
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_curve_and_beta(spark):
    rows = {r["checkpoint"]: r
            for r in vocab_growth(_df(spark), bucket_docs=2).collect()}
    assert (rows[0]["tokens_cum"], rows[0]["vocab_cum"]) == (5, 3)
    assert (rows[1]["tokens_cum"], rows[1]["vocab_cum"]) == (10, 6)
    assert (rows[2]["tokens_cum"], rows[2]["vocab_cum"]) == (14, 6)
    assert rows[0]["beta_local_micro"] is None  # no predecessor
    want_b1 = ((ln_micro_py(6, 1) - ln_micro_py(3, 1)) * MICRO
               // (ln_micro_py(10, 1) - ln_micro_py(5, 1)))
    assert rows[1]["beta_local_micro"] == want_b1  # V doubled as N doubled
    assert rows[2]["beta_local_micro"] == 0        # no new types
    assert rows[1]["new_types"] == 3 and rows[2]["new_types"] == 0


def test_matches_duckdb_oracle(spark):
    docs_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in DOCS)
    want = sorted(
        tuple(r) for r in duckdb.connect().execute(
            vocab_growth_oracle_sql(docs_sql, bucket_docs=2)).fetchall())
    got = sorted(tuple(r)
                 for r in vocab_growth(_df(spark), bucket_docs=2).collect())
    assert got == want and len(got) == 3
