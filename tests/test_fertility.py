"""Fertility stats (operators/fertility.py): hand-computed per-slice
ratios, multibyte bytes-vs-chars divergence, empty-text guard, DuckDB
parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.fertility import (
    fertility_stats,
    fertility_stats_oracle_sql,
)

DOCS = [
    ("en", "four token text here"),   # 4 tokens, 20 chars, 20 bytes
    ("en", "ab cd"),                  # 2 tokens, 5 chars
    ("de", "straße länge"),           # 2 tokens, 12 chars, 14 bytes
    ("zz", ""),                       # 0 tokens → NULL ratios
]


def _df(spark):
    return spark.createDataFrame(DOCS, "lang string, text string")


def test_slice_ratios(spark):
    rows = {r["slice_key"]: r for r in fertility_stats(_df(spark)).collect()}
    en = rows["en"]
    assert en["n_docs"] == 2 and en["n_tokens"] == 6
    assert en["n_chars"] == 25 and en["n_bytes"] == 25
    assert en["chars_per_token_micro"] == 25 * 1_000_000 // 6
    de = rows["de"]
    assert de["n_chars"] == 12 and de["n_bytes"] == 14  # ß, ä = 2 bytes
    assert de["bytes_per_token_micro"] == 7_000_000
    assert de["chars_per_token_micro"] == 6_000_000
    zz = rows["zz"]
    assert zz["n_tokens"] == 0
    assert zz["bytes_per_token_micro"] is None
    assert zz["tokens_per_doc_micro"] == 0


def test_matches_duckdb_oracle(spark):
    d_sql = " UNION ALL ".join(
        f"SELECT '{l}' AS lang, '{t}' AS text" for l, t in DOCS)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(fertility_stats_oracle_sql(d_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in fertility_stats(_df(spark)).collect())
    assert got == want and len(got) == 3
