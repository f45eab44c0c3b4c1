"""Tokenizer-fertility statistics per corpus slice — bytes, characters
and whitespace tokens with their micro-unit ratios, grouped by any
slice key (language, source, domain).  The LLM-training planning
numbers: bytes-per-token is the compression a tokenizer achieves on a
slice (CJK and morphologically rich languages run 2-4× the English
rate — Scao et al., BLOOM 2022 report exactly these per-language
fertility tables when sizing the multilingual mix), and chars-per-
token decides context-window budgeting per language.  Pairs with the
mix/quota operators (`operators/sampling.py::training_mix`): quotas
set in DOCUMENTS lie when token fertility differs 4× across slices.

Exactness: ``octet_length``/``length``/token counts are BIGINT;
ratios are one truncating division each on slice AGGREGATES (never
per-row rational averages — the sum-then-divide form is both exact
and the statistically right estimator).  Whitespace tokenization is
the repo's standard surface count (`operators/textstats.py`); a real
BPE is a model artifact, not an engine operator — the column contract
is identical when one is plugged in as a precomputed count.

Scale shape: one projection + one map-side-combinable groupBy on the
slice key; output is slice-cardinality-sized.

Reference anchor: the reference counts tokens per file with a
pluggable tokenizer (`src/aci/core/tokenizer.py`) — this is the
slice-level planning aggregate over those counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def fertility_stats(
    docs: DataFrame,
    slice_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """→ (slice_key, n_docs, n_bytes, n_chars, n_tokens,
    bytes_per_token_micro, chars_per_token_micro, tokens_per_doc_micro):
    the fertility planning row per slice.  Token-free slices report
    NULL ratios (a division guard, not a crash)."""
    t = docs.selectExpr(
        f"{slice_col} AS slice_key",
        f"CAST(octet_length({text_col}) AS BIGINT) AS b",
        f"CAST(length({text_col}) AS BIGINT) AS c",
        f"CAST(size(filter(split({text_col}, '[ ]+'), x -> x <> ''))"
        " AS BIGINT) AS t",
    )
    return t.groupBy("slice_key").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("b").alias("n_bytes"),
        F.sum("c").alias("n_chars"),
        F.sum("t").alias("n_tokens"),
    ).selectExpr(
        "slice_key", "n_docs", "n_bytes", "n_chars", "n_tokens",
        f"CASE WHEN n_tokens = 0 THEN NULL "
        f"ELSE n_bytes * {MICRO} DIV n_tokens END AS bytes_per_token_micro",
        f"CASE WHEN n_tokens = 0 THEN NULL "
        f"ELSE n_chars * {MICRO} DIV n_tokens END AS chars_per_token_micro",
        f"n_tokens * {MICRO} DIV n_docs AS tokens_per_doc_micro",
    )


def fertility_stats_oracle_sql(docs_sql: str) -> str:
    """DuckDB mirror: same splits, same aggregate-then-divide ratios.
    (Spark ``octet_length`` ≡ DuckDB ``strlen`` — UTF-8 bytes; both
    engines' ``length`` counts codepoints.)"""
    return f"""
    WITH t AS (
      SELECT slice_key,
             CAST(strlen(text) AS BIGINT) AS b,
             CAST(length(text) AS BIGINT) AS c,
             CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                                  x -> x <> '')) AS BIGINT) AS t
      FROM (SELECT lang AS slice_key, text FROM ({docs_sql}))),
    agg AS (
      SELECT slice_key, CAST(count(*) AS BIGINT) AS n_docs,
             sum(b) AS n_bytes, sum(c) AS n_chars, sum(t) AS n_tokens
      FROM t GROUP BY slice_key)
    SELECT slice_key, n_docs, n_bytes, n_chars, n_tokens,
           CASE WHEN n_tokens = 0 THEN NULL
                ELSE n_bytes * {MICRO} // n_tokens END
             AS bytes_per_token_micro,
           CASE WHEN n_tokens = 0 THEN NULL
                ELSE n_chars * {MICRO} // n_tokens END
             AS chars_per_token_micro,
           n_tokens * {MICRO} // n_docs AS tokens_per_doc_micro
    FROM agg
    """
