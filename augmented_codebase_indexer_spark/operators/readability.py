"""Readability scoring for training-data curation — LIX (Björnsson
1968, "Läsbarhetsindex") and RIX (Anderson 1983), the two classic
language-agnostic readability indices built from surface counts only:

    LIX = words/sentences + 100 · long_words/words      (long = ≥ 7 chars)
    RIX = long_words/sentences

Both need no syllable dictionary (unlike Flesch-Kincaid), which is why
web-scale curation pipelines use them as cheap quality features
alongside the Gopher rules (`operators/curation_filters.py`).

Exactness: every count is BIGINT from split/filter/regexp surface
scans; the indices are gated in integer micro units via truncating
division only (LIX_micro = words·1e6 DIV sents + long·1e8 DIV words —
the two-term sum of truncations is itself deterministic on both
engines). Sentence count is ``greatest(1, terminator_runs)`` so
punctuation-free fragments (common in web text) score as one sentence
instead of dividing by zero; zero-word docs emit NULL scores, never an
error. Bands use the published LIX cut points 25/35/45/55 compared in
micro units — integer compares on already-quantized values.

Scale shape: one narrow projection — per-row array ops and regexp
counts in whole-stage codegen, zero exchanges, zero UDFs. 10^12 docs
cost one scan.

Reference anchor: the reference gates what enters its index by cheap
per-file surface checks before any expensive stage
(`src/aci/core/file_scanner/scanner.py:283` size cap) — readability is
the same ingest-time gate for prose quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# published LIX bands: <25 very easy, 25-35 easy, 35-45 medium,
# 45-55 hard, >55 very hard — compared in micro units
_BANDS_MICRO = (25_000_000, 35_000_000, 45_000_000, 55_000_000)
_SENT_RE = "([.!?]+)"  # escape-free class: identical literal in both engines


def readability_scores(
    docs: DataFrame, text_col: str = "text", long_chars: int = 7
) -> DataFrame:
    """→ (doc_id, n_words, n_sents, n_long, lix_micro, rix_micro,
    lix_band): surface counts + integer-micro LIX/RIX. ``n_sents``
    counts terminator RUNS ('...' is one boundary) with a floor of 1;
    zero-word docs keep their row with NULL scores."""
    b1, b2, b3, b4 = _BANDS_MICRO
    return docs.selectExpr(
        "doc_id",
        f"size(filter(split({text_col}, ' '), t -> t <> '')) AS n_words",
        f"greatest(1, size(regexp_extract_all({text_col}, '{_SENT_RE}', 1)))"
        " AS n_sents",
        f"size(filter(split({text_col}, ' '), t -> length(t) >= {long_chars}))"
        " AS n_long",
    ).selectExpr(
        "doc_id",
        "CAST(n_words AS BIGINT) AS n_words",
        "CAST(n_sents AS BIGINT) AS n_sents",
        "CAST(n_long AS BIGINT) AS n_long",
        "CASE WHEN n_words = 0 THEN NULL"
        " ELSE CAST(n_words AS BIGINT) * 1000000 DIV n_sents"
        " + CAST(n_long AS BIGINT) * 100000000 DIV n_words END AS lix_micro",
        "CASE WHEN n_words = 0 THEN NULL"
        " ELSE CAST(n_long AS BIGINT) * 1000000 DIV n_sents END AS rix_micro",
    ).selectExpr(
        "*",
        "CASE WHEN lix_micro IS NULL THEN NULL"
        f" WHEN lix_micro < {b1} THEN 'very_easy'"
        f" WHEN lix_micro < {b2} THEN 'easy'"
        f" WHEN lix_micro < {b3} THEN 'medium'"
        f" WHEN lix_micro < {b4} THEN 'hard'"
        " ELSE 'very_hard' END AS lix_band",
    )


def readability_oracle_sql(
    table: str = "documents", long_chars: int = 7
) -> str:
    """DuckDB mirror: same counts, same trunc divisions, same bands."""
    b1, b2, b3, b4 = _BANDS_MICRO
    return f"""
    WITH c AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t <> '')) AS BIGINT) AS n_words,
             CAST(greatest(1, len(regexp_extract_all(text, '{_SENT_RE}', 1)))
                  AS BIGINT) AS n_sents,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> length(t) >= {long_chars}))
                  AS BIGINT) AS n_long
      FROM {table}),
    s AS (
      SELECT doc_id, n_words, n_sents, n_long,
             CASE WHEN n_words = 0 THEN NULL
                  ELSE n_words * 1000000 // n_sents
                       + n_long * 100000000 // n_words END AS lix_micro,
             CASE WHEN n_words = 0 THEN NULL
                  ELSE n_long * 1000000 // n_sents END AS rix_micro
      FROM c)
    SELECT *,
           CASE WHEN lix_micro IS NULL THEN NULL
                WHEN lix_micro < {b1} THEN 'very_easy'
                WHEN lix_micro < {b2} THEN 'easy'
                WHEN lix_micro < {b3} THEN 'medium'
                WHEN lix_micro < {b4} THEN 'hard'
                ELSE 'very_hard' END AS lix_band
    FROM s
    """
