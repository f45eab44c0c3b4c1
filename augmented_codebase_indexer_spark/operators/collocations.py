"""Bigram collocation mining by Dunning's log-likelihood ratio (Dunning
1993, "Accurate Methods for the Statistics of Surprise and
Coincidence") — the standard phrase detector for building multi-word
vocabulary entries ("new york", "machine learning") in web-corpus
pipelines; G² is robust at low counts where PMI explodes
(`operators/comention.py` holds the PMI form for entity co-mentions).

For each adjacent token pair the 2×2 contingency table against the
corpus bigram stream is

    k11 = c(w1 w2)       k12 = c(w1 ·) − k11
    k21 = c(· w2) − k11  k22 = N − r1 − c1 + k11

and G² = 2·Σ_ij k_ij · ln(k_ij·N / (R_i·C_j)), with zero cells
contributing exactly 0.

Exactness: every ln comes from the libm-free fixed-point BIGINT log
(``functions/intlog.py`` — the same construction both engines evaluate
bit-identically); zero cells multiply their (well-defined, clamped) log
by k_ij = 0, so no CASE races the quantization. The gate is a pure
BIGINT sum of products; the significance verdict compares llr_micro to
the χ²₁ p<0.001 critical value 10.83 quantized once to micro units.

Scale shape at 10^12 docs: bigram pairs are built ARRAY-SIDE (a guarded
``transform(sequence(...))`` inside whole-stage codegen — token rows
never explode into an exchange); the only shuffles carry the bigram
VOCABULARY: one (w1, w2) groupBy (map-side combined), two vocabulary-
sized margin aggregations joined back as broadcasts, one 1-row total.
The 4 intlog chains run over the bigram-vocab frame, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.intlog import duckdb_ln_micro_sql, with_ln_micro
from .guards import register_pin

# 2·ln threshold: χ²(1) critical value 10.83 (p < 0.001), micro units
SIG_MICRO = 10_830_000


def bigram_llr(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """→ (w1, w2, k11, r1, c1, n_pairs, llr_micro, is_collocation).

    ``min_count`` prunes the OUTPUT (margins are computed over the full
    bigram stream first, so pruning never biases the statistics)."""
    toks = f"filter(split(lower({text_col}), ' '), t -> t <> '')"
    # guard: sequence(1, 0) in Spark yields [1, 0] (descending), so
    # singleton/empty docs must short-circuit to an empty index array.
    # r7: explode a plain INT sequence and index the token array in the
    # codegen projection above — the former struct-array transform built
    # ~10M interpreted struct allocations per corpus pass (measured 8.1 s
    # at sf0.1 for the pair stream alone); same i-range over the same
    # toks, so the (w1, w2) multiset is identical.
    pairs = docs.selectExpr(f"{toks} AS toks").selectExpr(
        "toks",
        "explode(CASE WHEN size(toks) < 2 THEN array() "
        "ELSE sequence(1, size(toks) - 1) END) AS i",
    ).selectExpr("toks[i-1] AS w1", "toks[i] AS w2")
    k = pairs.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("k11"))
    # r7: the margins r, c, n and the cells join all re-derive from k; a
    # localCheckpoint of the (vocabulary-sized — 931 rows at sf0.1) bigram
    # table collapses what were FOUR full corpus passes into one. Values
    # unchanged; recomputed fresh inside every run.
    k = k.localCheckpoint(eager=True)
    r = k.groupBy("w1").agg(F.sum("k11").cast("long").alias("r1"))
    c = k.groupBy("w2").agg(F.sum("k11").cast("long").alias("c1"))
    n = k.agg(F.sum("k11").cast("long").alias("n_pairs"))
    cells = (
        k.join(F.broadcast(r), "w1")
        .join(F.broadcast(c), "w2")
        .crossJoin(F.broadcast(n))
    )
    for cell, num, den in _CELLS:
        cells = with_ln_micro(cells, num, den, f"ln_{cell}", prefix=f"_l{cell}")
        # r7: cut the plan after EVERY tower — the four ~44-step intlog
        # chains composed into one tree cost ~7 s of driver-side Catalyst
        # work at 931 rows (the pair pass itself is 3.9 s); checkpointing
        # the vocabulary-sized frame between chains keeps each analyzed
        # tree one tower deep. Values unchanged.
        cells = register_pin(cells.localCheckpoint(eager=True))
    out = cells.selectExpr(
        "w1", "w2", "k11", "r1", "c1", "n_pairs",
        f"2 * ({_LLR_TERMS}) AS llr_micro",
    ).selectExpr("*", f"llr_micro > {SIG_MICRO} AS is_collocation")
    if min_count > 1:
        out = out.filter(F.col("k11") >= min_count)
    return out


# the four 2×2 cells: (suffix, ln numerator, ln denominator). Zero cells
# clamp the ln argument to ≥1/den (greatest) — the log stays defined and
# the k·ln product is exactly 0.
_CELLS = [
    ("11", "greatest(k11 * n_pairs, 1)", "r1 * c1"),
    ("12", "greatest((r1 - k11) * n_pairs, 1)",
     "greatest(r1 * (n_pairs - c1), 1)"),
    ("21", "greatest((c1 - k11) * n_pairs, 1)",
     "greatest((n_pairs - r1) * c1, 1)"),
    ("22", "greatest((n_pairs - r1 - c1 + k11) * n_pairs, 1)",
     "greatest((n_pairs - r1) * (n_pairs - c1), 1)"),
]

_LLR_TERMS = (
    "k11 * ln_11 + (r1 - k11) * ln_12 + (c1 - k11) * ln_21"
    " + (n_pairs - r1 - c1 + k11) * ln_22"
)


def bigram_llr_oracle_sql(
    table: str = "documents", min_count: int = 1
) -> str:
    """DuckDB mirror: adjacent pairs via a (doc, pos) self-join (the
    oracle favors obviousness over narrowness), then the identical
    intlog chains and BIGINT products."""
    # four SIDE-BY-SIDE intlog chains (one nested 44-level chain each,
    # joined back on the bigram key) — chaining all four in one nested
    # stack (176 levels) exhausts DuckDB's PARSER, not its executor
    chains = []
    for cell, num, den in _CELLS:
        chain = duckdb_ln_micro_sql(
            "SELECT * FROM cells0", num, den, f"ln_{cell}",
            keep_cols="w1, w2", prefix=f"_l{cell}",
        )
        chains.append(f"l{cell} AS ({chain})")
    ln_ctes = ",\n    ".join(chains)
    pred = f"WHERE k11 >= {min_count}" if min_count > 1 else ""
    terms = _LLR_TERMS
    return f"""
    WITH tl AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
      FROM {table}),
    tok AS (
      SELECT doc_id, unnest(toks) AS w,
             CAST(unnest(range(1, len(toks) + 1)) AS BIGINT) AS pos
      FROM tl),
    cells0 AS MATERIALIZED (
      SELECT w1, w2, k11,
             CAST(sum(k11) OVER (PARTITION BY w1) AS BIGINT) AS r1,
             CAST(sum(k11) OVER (PARTITION BY w2) AS BIGINT) AS c1,
             CAST(sum(k11) OVER () AS BIGINT) AS n_pairs
      FROM (SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11
            FROM (SELECT a.w AS w1, b.w AS w2
                  FROM tok a JOIN tok b
                  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
            GROUP BY w1, w2)),
    {ln_ctes},
    cells AS (
      SELECT * FROM cells0
      JOIN l11 USING (w1, w2) JOIN l12 USING (w1, w2)
      JOIN l21 USING (w1, w2) JOIN l22 USING (w1, w2))
    SELECT w1, w2, k11, r1, c1, n_pairs,
           2 * ({terms}) AS llr_micro,
           2 * ({terms}) > {SIG_MICRO} AS is_collocation
    FROM cells {pred}
    """
