"""Text analysis operators for training-data curation, all JVM-side built-ins
(SQL-mirrorable — no UDF, so the DuckDB oracle can replicate them exactly):

* token counting (whitespace + word-regex variants; C2 analog —
  the reference's CharacterTokenizer fallback ``core/tokenizer.py:141-152``
  legitimizes heuristic counting)
* quality scoring (length / punctuation / stopword ratios)
* language ID (stopword-marker n-gram heuristic with deterministic argmax)
* document fingerprint (rolling hash — JVM expressions, oracle-gated)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.sqlhash import fingerprint_expr

# language marker words → regex alternations (kept tiny + deterministic;
# real systems plug fasttext here, same operator shape)
LANG_MARKERS = {
    "en": r"\b(the|and|of|with|for)\b",
    "de": r"\b(der|die|und|das|mit)\b",
    "fr": r"\b(le|la|et|les|des)\b",
    "es": r"\b(el|los|las|y|con)\b",
}
STOPWORD_RE = r"\b(the|a|an|and|or|of|to|in|is|it)\b"
WORD_RE = r"[a-z0-9]+"


def token_count_cols(text: Column) -> dict[str, Column]:
    return {
        "n_tokens_ws": F.size(F.split(text, " ")),
        "n_tokens_re": F.regexp_count(text, F.lit(WORD_RE)),
        "n_chars_out": F.length(text),
    }


def quality_score_col(text: Column) -> Column:
    """[0,1] quality heuristic: longer docs with balanced token length and
    some stopwords score higher; punctuation-heavy junk scores lower.

    Cross-engine rounding note (measured, round 2): Spark's round() applies
    HALF_UP to the double's SHORTEST decimal repr (BigDecimal.valueOf) while
    DuckDB/Python round the exact binary value, and the two engines'
    unrounded doubles occasionally differ by 1 ulp (FMA contraction). When a
    score lands exactly on a 6th-decimal tie the oracle can disagree in the
    last digit — measured rate 1/5000 docs at sf0.1, 5/500 exact ties at
    sf0.01. As of r5 every ORACLE-GATED output uses
    :func:`quality_micro_col` (exact BIGINT) instead; this float form is
    display/diagnostic only."""
    n_chars = F.length(text)
    n_tokens = F.size(F.split(text, " "))
    stop = F.regexp_count(text, F.lit(STOPWORD_RE))
    punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    len_score = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    stop_score = F.least(stop / F.greatest(n_tokens, F.lit(1)) * 5.0, F.lit(1.0))
    punct_penalty = F.least(punct / F.greatest(n_chars, F.lit(1)) * 10.0, F.lit(1.0))
    return F.round(
        (len_score * 0.5 + stop_score * 0.3) * (F.lit(1.0) - punct_penalty * 0.5), 6
    )


def _idiv(a: Column, b: Column | int) -> Column:
    """Exact integer floor-division for NON-NEGATIVE operands:
    floor(a / b) — matches DuckDB's BIGINT ``//`` on the same operands.

    Exactness: a, b ≤ 2^53 so both cast to double losslessly; the
    correctly-rounded IEEE quotient is q + r/b ± ulp(quotient). In every
    quality_micro_col use the quotient is ≤ 1e6 (ulp ≈ 2e-10) and any
    nonzero remainder has r/b ≥ 1e-6 >> ulp, while r = 0 divides to
    exactly-representable q — so floor() can never be off by one.

    Why floor and not the algebraic ``(a - a % b) / b`` (the r5 form):
    that construction references ``a`` TWICE, and the nested divisions in
    quality_micro_col squared the duplication — the two regexp_count
    subtrees were evaluated ~4× per row past codegen CSE, a measured
    ~1.8× wall regression on the curation chain (BENCH.md r6
    attribution). floor references ``a`` once; the gated VALUES are
    bit-identical (asserted over the full sf0.01 corpus + planted
    boundary texts in
    tests/test_operators.py::test_quality_micro_div_forms_agree, and
    over sf0.1 by hand during the r6 attribution: 0 diffs / 5000)."""
    b = F.lit(b) if isinstance(b, int) else b
    return F.floor(a / b).cast("long")


def quality_micro_col(text: Column) -> Column:
    """The GATED form of :func:`quality_score_col`: quality in integer
    micro units [0, 1_000_000], every step BIGINT arithmetic (least/
    greatest, multiply, truncating integer division) so Spark and the
    DuckDB oracle produce byte-identical values BY CONSTRUCTION.

    Why (measured, r5): the float score lands EXACTLY on a 6-dp half-way
    tie for 5/500 sf0.01 docs (e.g. 0.5028125 → 502812.5) — the same
    cross-engine rounding-tie class that made lm_quality's r4 driver row
    red (a tie resolves ulp-/build-dependently between Spark's
    shortest-repr HALF_UP and DuckDB's multiply-then-round). Ties are not
    rare noise here: quality is a rational of small integers, so exact
    6-dp ties are structural. Semantics track the float score to within
    ≤4 micro of truncation:

        len_micro  = least(nc, 400) * 2500            (= min(nc/400,1)·1e6)
        stop_micro = (least(5·stop, nt) · 1e6) DIV nt
        pen_micro  = (least(10·punct, nc') · 1e6) DIV nc'
        quality    = ((len_micro DIV 2) + (stop_micro·3) DIV 10)
                     · (1e6 − pen_micro DIV 2) DIV 1e6

    SQL mirror: :func:`quality_micro_sql`."""
    nc = F.length(text).cast("long")
    nt = F.greatest(F.size(F.split(text, " ")), F.lit(1)).cast("long")
    stop = F.regexp_count(text, F.lit(STOPWORD_RE)).cast("long")
    punct = F.regexp_count(text, F.lit(r"[^\w\s]")).cast("long")
    nc2 = F.greatest(nc, F.lit(1))
    len_micro = F.least(nc, F.lit(400)) * 2500
    stop_micro = _idiv(F.least(stop * 5, nt) * 1_000_000, nt)
    pen_micro = _idiv(F.least(punct * 10, nc2) * 1_000_000, nc2)
    return _idiv(
        (_idiv(len_micro, 2) + _idiv(stop_micro * 3, 10))
        * (F.lit(1_000_000) - _idiv(pen_micro, 2)),
        1_000_000,
    )


def quality_micro_sql(text_expr: str = "text") -> str:
    """DuckDB expression mirroring ``quality_micro_col`` — all-BIGINT
    (`//` is floor division; operands are non-negative so it equals the
    Spark emulation in ``_idiv`` exactly)."""
    nc = f"CAST(length({text_expr}) AS BIGINT)"
    nt = f"greatest(CAST(len(string_split({text_expr}, ' ')) AS BIGINT), 1)"
    stop = f"CAST(len(regexp_extract_all({text_expr}, '{STOPWORD_RE}')) AS BIGINT)"
    punct = f"CAST(len(regexp_extract_all({text_expr}, '[^\\w\\s]')) AS BIGINT)"
    nc2 = f"greatest({nc}, 1)"
    len_micro = f"(least({nc}, 400) * 2500)"
    stop_micro = f"((least({stop} * 5, {nt}) * 1000000) // {nt})"
    pen_micro = f"((least({punct} * 10, {nc2}) * 1000000) // {nc2})"
    return (
        f"((({len_micro} // 2) + ({stop_micro} * 3) // 10)"
        f" * (1000000 - {pen_micro} // 2) // 1000000)"
    )


def lang_id_col(text: Column) -> Column:
    """Argmax of marker-word hits, deterministic tie-break by marker order,
    'unknown' when nothing matches. Pure expressions → Catalyst codegen."""
    counts = {lang: F.regexp_count(text, F.lit(pat)) for lang, pat in LANG_MARKERS.items()}
    best_count = F.greatest(*counts.values())
    out = F.lit("unknown")
    for lang in reversed(list(LANG_MARKERS)):  # earlier entries win ties
        out = F.when(counts[lang] == best_count, F.lit(lang)).otherwise(out)
    return F.when(best_count > 0, out).otherwise(F.lit("unknown"))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    out = df
    for name, col in token_count_cols(t).items():
        out = out.withColumn(name, col)
    return (
        out.withColumn("quality_micro", quality_micro_col(t))
        .withColumn("lang_pred", lang_id_col(t))
    )


def gopher_flag_cols(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_stopwords: int = 2,
    min_frac_alpha: float = 0.8,
    max_dup_2gram: float = 0.2,
) -> dict[str, Column]:
    """Gopher-rule columns for an arbitrary text column — measured values,
    per-rule booleans, and the ``passes`` conjunction. Exposed separately
    from the operator so composed pipelines (curation v3) can use
    ``passes`` as a narrow filter predicate without a join."""
    from .curation_filters import dup_2gram_frac_col

    toks = F.split(text, " ")
    n_words = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda acc, x: acc + x
    )
    mean_len = F.floor(sum_len / F.greatest(n_words, F.lit(1)) * 1e6) / 1e6
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    frac_alpha = F.floor(n_alpha / F.greatest(n_words, F.lit(1)) * 1e6) / 1e6
    n_stop = F.regexp_count(text, F.lit(STOPWORD_RE))
    dup2 = dup_2gram_frac_col(text)
    cols = {
        "n_words": n_words.cast("long"),
        "mean_word_len": mean_len,
        "frac_alpha": frac_alpha,
        "n_stopwords": n_stop.cast("long"),
        "dup_2gram_frac": dup2,
        "flag_words": (n_words >= min_words) & (n_words <= max_words),
        "flag_mean_len": (mean_len >= min_mean_len) & (mean_len <= max_mean_len),
        "flag_stopwords": n_stop >= min_stopwords,
        "flag_alpha": frac_alpha >= min_frac_alpha,
        "flag_repetition": dup2 <= max_dup_2gram,
    }
    passes = None
    for name, c in cols.items():
        if name.startswith("flag_"):
            passes = c if passes is None else (passes & c)
    cols["passes"] = passes
    return cols


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1 shape:
    word-count window, mean-word-length window, stopword floor, alphabetic
    fraction, repetition cap), as pure JVM expressions — zero shuffle, zero
    UDF, fused into the scan, and exactly SQL-mirrorable so the DuckDB
    oracle replays every rule. Emits per-rule booleans plus the measured
    values (not just a verdict) so a curation run can report WHICH rule
    rejected each page; ``passes`` is the conjunction. Floats are floored to
    6 decimals on both engines before thresholding (cross-engine ulp
    hygiene, see quality_score_col note)."""
    cols = gopher_flag_cols(F.col(text_col), **thresholds)
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[col.alias(name) for name, col in cols.items()],
    )


def gopher_passes_sql(
    text_expr: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_stopwords: int = 2,
    min_frac_alpha: float = 0.8,
    max_dup_2gram: float = 0.2,
) -> str:
    """DuckDB boolean predicate mirroring ``gopher_flag_cols(...)['passes']``
    for an arbitrary text expression — used by composed pipelines."""
    toks = f"string_split({text_expr}, ' ')"
    n = f"len({toks})"
    mean_len = (
        f"(floor(CAST(list_sum(list_transform({toks}, w -> length(w))) AS DOUBLE)"
        f" / greatest({n}, 1) * 1e6) / 1e6)"
    )
    frac_alpha = (
        f"(floor(CAST(len(list_filter({toks}, w -> regexp_matches(w, '[a-z]')))"
        f" AS DOUBLE) / greatest({n}, 1) * 1e6) / 1e6)"
    )
    n_stop = f"len(regexp_extract_all({text_expr}, '{STOPWORD_RE}'))"
    dup2 = (
        f"(CASE WHEN {n} >= 2 THEN floor((1.0 - CAST(len(list_distinct("
        f"[{toks}[i] || ' ' || {toks}[i+1] FOR i IN range(1, {n})]"
        f")) AS DOUBLE) / ({n} - 1)) * 1e6) / 1e6 ELSE 0.0 END)"
    )
    return (
        f"({n} >= {min_words} AND {n} <= {max_words}"
        f" AND {mean_len} >= {min_mean_len} AND {mean_len} <= {max_mean_len}"
        f" AND {n_stop} >= {min_stopwords}"
        f" AND {frac_alpha} >= {min_frac_alpha}"
        f" AND {dup2} <= {max_dup_2gram})"
    )


def gopher_oracle_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_stopwords: int = 2,
    min_frac_alpha: float = 0.8,
    max_dup_2gram: float = 0.2,
    table: str = "documents",
) -> str:
    """DuckDB mirror of ``gopher_quality_flags`` (same rules, same floors)."""
    return f"""
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           mean_word_len, frac_alpha,
           CAST(n_stopwords AS BIGINT) AS n_stopwords,
           dup_2gram_frac,
           (n_words >= {min_words} AND n_words <= {max_words}) AS flag_words,
           (mean_word_len >= {min_mean_len} AND mean_word_len <= {max_mean_len})
             AS flag_mean_len,
           (n_stopwords >= {min_stopwords}) AS flag_stopwords,
           (frac_alpha >= {min_frac_alpha}) AS flag_alpha,
           (dup_2gram_frac <= {max_dup_2gram}) AS flag_repetition,
           (n_words >= {min_words} AND n_words <= {max_words}
            AND mean_word_len >= {min_mean_len} AND mean_word_len <= {max_mean_len}
            AND n_stopwords >= {min_stopwords}
            AND frac_alpha >= {min_frac_alpha}
            AND dup_2gram_frac <= {max_dup_2gram}) AS passes
    FROM (
      SELECT doc_id,
             len(toks) AS n_words,
             floor(CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
                   / greatest(len(toks), 1) * 1e6) / 1e6 AS mean_word_len,
             floor(CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
                        AS DOUBLE) / greatest(len(toks), 1) * 1e6) / 1e6 AS frac_alpha,
             len(regexp_extract_all(text, '{STOPWORD_RE}')) AS n_stopwords,
             (CASE WHEN len(toks) >= 2 THEN
                floor((1.0 - CAST(len(list_distinct(
                   [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]
                )) AS DOUBLE) / (len(toks) - 1)) * 1e6) / 1e6
              ELSE 0.0 END) AS dup_2gram_frac
      FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM {table})
    )
    """


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling-hash document fingerprint as pure JVM expressions
    (``sqlhash.fingerprint_expr``): hashes are in [0, 2^32) so the column is
    array<bigint> — the round-1 pandas-UDF ArrayType(IntegerType()) silently
    wrapped values > 2^31-1 to negative int32 (ADVICE r1). The same
    expression string (DuckDB dialect) is the driver oracle, and the pure
    Python ``hashing.rolling_fingerprint`` pins both in pytest."""
    return df.withColumn("fingerprint", F.expr(fingerprint_expr(text_col, "spark")))
