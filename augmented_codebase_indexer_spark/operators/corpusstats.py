"""Corpus-level distribution statistics: inter-slice KL divergence and
Zipf frequency profiles — the mixing/drift diagnostics a training-data
pipeline runs next to its DSIR weights (``lmquality.dsir_log_ratio``
scores DOCUMENTS against a target LM; ``slice_kl_divergence`` scores the
SLICES against each other, which is how you decide a source's weight or
catch a crawl snapshot drifting from the last one). Public grounding:
KL-based domain-shift checks are standard corpus hygiene (Kullback &
Leibler 1951; the CCNet/DSIR line of work — Wenzek et al. 2020, Xie et
al. 2023 — uses exactly these unigram LMs). The reference has no analog
(its corpus is code; nearest is the stats read path,
``src/aci/cli/repl/search_ops.py``'s index stats) — this module is part
of the LLM-data-pipeline surface the survey adds on top.

Cross-engine exactness (the repo's oracle discipline, as in
``lmquality.py``): per-(slice, token) log-probs are quantized ONCE to
integer micro-nats over the SHARED union vocabulary; every gated output
is then BIGINT arithmetic only — sums, cross-multiplies, truncating
integer division. No float round crosses the engine boundary.

Scale shape at 10^12 tokens:

* ``slice_kl_divergence`` — one (source, tok) count shuffle over the
  corpus; the densified (S slices × V tokens) log-prob frame is slim
  integer rows, joined to itself tok-keyed (S rows per key per side —
  no skew for small S); the final pair aggregation is map-side-combined
  down to S·(S−1) rows. S is the number of SOURCES (dozens), never the
  number of documents. Overflow bound: the BIGINT numerator is
  ≤ (T+V)·max|Δlp_micro| ≈ 35e6·T — exact up to ~2.6e11 tokens per
  slice; shard larger slices before calling (documented, not silent).
* ``zipf_profile`` — one token count shuffle; the global top-N is
  planned as TakeOrderedAndProject (per-partition top-N merged on the
  driver, NOT an unpartitioned window over all distinct tokens); only
  the ≤ N surviving rows see the rank/cumulative window, so the single
  partition it runs in is bounded by N, not by vocabulary size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.intlog import duckdb_ln_micro_sql, with_ln_micro
from .lmquality import token_frame


def slice_kl_divergence(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """KL(P_a || P_b) for every ordered pair of corpus slices.

    Each slice's unigram distribution is add-one smoothed over the
    SHARED union vocabulary (V = distinct tokens corpus-wide), so every
    pair is compared on identical support:

        P_s(tok) = (c_s(tok) + 1) / (T_s + V + 1)

    Returns (src_a, src_b, kl_num_micro, kl_micro) with
    a ≠ b, where ``kl_num_micro = Σ_tok (c_a+1)·(lp_a − lp_b)`` is the
    exact BIGINT numerator over micro-nat log-probs and
    ``kl_micro = kl_num_micro DIV (T_a + V + 1)`` is KL in micro-nats
    (display nats = kl_micro / 1e6). KL ≥ 0 up to quantization; the
    truncating division matches DuckDB ``//`` on either sign.
    """
    tf = docs.select(F.col(source_col).alias("source"), "doc_id", text_col)
    toks = (
        tf.select(
            "source",
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    vocab = counts.select("tok").distinct()
    v1 = F.broadcast(vocab.agg(F.count("*").cast("long").alias("V")))
    totals = F.broadcast(
        counts.groupBy("source")
        .agg(F.sum("c").cast("long").alias("T"))
        .crossJoin(v1)
    )
    # densify: every (slice, union-vocab token) gets a row, absent tokens
    # at c = 0 — the smoothed support both engines share
    dense = with_ln_micro(
        totals.crossJoin(vocab)
        .join(counts, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            (F.coalesce("c", F.lit(0)) + 1).cast("long").alias("cp1"),
            (F.col("T") + F.col("V") + 1).cast("long").alias("D"),
        ),
        "cp1", "D", "lp_micro",
    )
    # r7: dense (the intlog tower AND its upstream corpus token pass)
    # feeds BOTH sides of the slice self-join below — pin the
    # (slices × vocabulary)-sized frame so the pass and the tower run once
    from .guards import register_pin

    dense = register_pin(dense.localCheckpoint(eager=True))
    a = dense.select(
        F.col("source").alias("src_a"), "tok",
        F.col("cp1").alias("cp1_a"), F.col("D").alias("d_a"),
        F.col("lp_micro").alias("lp_a"),
    )
    b = dense.select(
        F.col("source").alias("src_b"), F.col("tok").alias("tok_b"),
        F.col("lp_micro").alias("lp_b"),
    )
    return (
        a.join(b, (F.col("tok") == F.col("tok_b"))
               & (F.col("src_a") != F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(
            # D is constant within a src_a group (T_a + V + 1)
            F.first("d_a").alias("_d"),
            F.sum(F.col("cp1_a") * (F.col("lp_a") - F.col("lp_b")))
            .cast("long")
            .alias("kl_num_micro"),
        )
        .select(
            "src_a",
            "src_b",
            F.col("kl_num_micro"),
            F.expr("kl_num_micro DIV _d").alias("kl_micro"),
        )
    )


def slice_kl_oracle_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`slice_kl_divergence` — identical
    quantization, BIGINT arithmetic, truncating ``//`` division."""
    return f"""
    WITH tk AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM {table}),
    tf AS (SELECT source, tok FROM tk WHERE tok <> ''),
    cnt AS (SELECT source, tok, count(*) AS c FROM tf GROUP BY source, tok),
    toks AS (SELECT DISTINCT tok FROM cnt),
    v AS (SELECT CAST(count(*) AS BIGINT) AS V FROM toks),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS T FROM cnt GROUP BY source),
    dense AS ({duckdb_ln_micro_sql(
        '''SELECT t.source, k.tok,
             CAST(coalesce(c.c, 0) + 1 AS BIGINT) AS cp1,
             CAST(t.T + v.V + 1 AS BIGINT) AS D
      FROM tot t CROSS JOIN v CROSS JOIN toks k
      LEFT JOIN cnt c ON c.source = t.source AND c.tok = k.tok''',
        "cp1", "D", "lp", keep_cols="source, tok, cp1, D")})
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(sum(a.cp1 * (a.lp - b.lp)) AS BIGINT) AS kl_num_micro,
           CAST(sum(a.cp1 * (a.lp - b.lp)) // any_value(a.D) AS BIGINT)
             AS kl_micro
    FROM dense a JOIN dense b ON a.tok = b.tok AND a.source <> b.source
    GROUP BY 1, 2
    """


def zipf_profile(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Token frequency head of the corpus: (rank, tok, cnt, cum_micro).

    rank orders by (count desc, tok asc) — fully deterministic;
    ``cum_micro = (cumulative count · 1e6) DIV total corpus tokens`` is
    the integer-exact cumulative share (Zipf's-law checks read the
    rank→cnt curve; the head share tells you how top-heavy the corpus
    is). The top-N is a sort+limit (TakeOrderedAndProject); the
    rank/cumsum window then runs over ≤ ``top_n`` rows, so its single
    partition is bounded by the parameter, never by vocabulary size.
    """
    counts = (
        token_frame(docs.select("doc_id", text_col), text_col)
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    total = F.broadcast(counts.agg(F.sum("cnt").cast("long").alias("total")))
    top = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(top_n)
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    return (
        top.crossJoin(total)
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_micro",
            F.expr("(sum(cnt) OVER (ORDER BY cnt DESC, tok ASC "
                   "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                   "* 1000000) DIV total"),
        )
        .select("rank", "tok", "cnt", "cum_micro")
    )


def zipf_oracle_sql(table: str = "documents", top_n: int = 100) -> str:
    """DuckDB mirror of :func:`zipf_profile` — same ordering, same
    integer cumulative-share arithmetic."""
    return f"""
    WITH tk AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM {table}),
    cnt AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS cnt
      FROM tk WHERE tok <> '' GROUP BY tok),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cnt),
    top AS (
      SELECT tok, cnt FROM cnt ORDER BY cnt DESC, tok ASC LIMIT {top_n})
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC) AS INTEGER)
             AS rank,
           tok, cnt,
           CAST((sum(cnt) OVER (ORDER BY cnt DESC, tok ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1000000) // total AS BIGINT) AS cum_micro
    FROM top CROSS JOIN tot
    """


def slice_log_odds(
    docs: DataFrame,
    src_a: str,
    src_b: str,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Prior-smoothed log-odds keyword comparison between two slices
    (the "Fightin' Words" point estimate, Monroe, Colaresi & Quinn,
    Political Analysis 2008, eq. 15 with a flat Dirichlet prior):
    WHICH tokens distinguish slice a from slice b, where the scalar
    KL says only HOW FAR apart they are. Per union-vocab token w,

        delta(w) = ln[(y_a+1)/(n_a + V − y_a − 1)]
                 − ln[(y_b+1)/(n_b + V − y_b − 1)]

    in exact micro-nats via the libm-free intlog (two chains over the
    V-row vocab frame, the lm_vocab discipline) — positive means
    a-flavored. The 2008 paper's variance normalization needs a sqrt
    and is display-layer work; the gated estimate is the prior-
    smoothed point value, exact.

    Returns (tok, cnt_a, cnt_b, delta_micro). Scale shape: token text
    dies at the (source, tok) count aggregate; everything after runs
    at vocabulary grain."""
    toks = (
        docs.filter(F.col(source_col).isin([src_a, src_b]))
        .select(F.col(source_col).alias("source"),
                F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("source", "tok").agg(
        F.count("*").cast("long").alias("c"))
    vocab = counts.select("tok").distinct()
    v1 = F.broadcast(vocab.agg(F.count("*").cast("long").alias("V")))

    def side(src: str, label: str) -> DataFrame:
        cs = counts.filter(F.col("source") == src).select("tok", "c")
        n = F.broadcast(
            cs.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long")
                   .alias("n")).crossJoin(v1))
        dense = (
            vocab.join(cs, "tok", "left")
            .crossJoin(n)
            .select(
                "tok",
                F.coalesce("c", F.lit(0)).cast("long")
                .alias(f"cnt_{label}"),
                (F.coalesce("c", F.lit(0)) + 1).cast("long").alias("num"),
                (F.col("n") + F.col("V") - F.coalesce("c", F.lit(0)) - 1)
                .cast("long").alias("den"),
            )
        )
        # r7 note: eager-pinning each side was tried and REVERTED — it
        # serializes the two sides, which the planner otherwise computes as
        # concurrent branches of one job (2.2 s -> 2.9 s at sf0.1)
        return with_ln_micro(
            dense, "num", "den", f"lo_{label}", prefix=f"_fw{label}"
        ).select("tok", f"cnt_{label}", f"lo_{label}")

    return (
        side(src_a, "a").join(side(src_b, "b"), "tok")
        .selectExpr("tok", "cnt_a", "cnt_b",
                    "lo_a - lo_b AS delta_micro")
    )


def slice_log_odds_oracle_sql(
    src_a: str, src_b: str, table: str = "documents"
) -> str:
    """DuckDB mirror of :func:`slice_log_odds`."""
    base = f"""
    WITH toks AS MATERIALIZED (
      SELECT source, t AS tok FROM (
        SELECT source, unnest(string_split(text, ' ')) AS t
        FROM {table} WHERE source IN ('{src_a}', '{src_b}'))
      WHERE t <> ''),
    counts AS MATERIALIZED (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY source, tok),
    vocab AS MATERIALIZED (SELECT DISTINCT tok FROM counts),
    v1 AS (SELECT CAST(count(*) AS BIGINT) AS V FROM vocab)"""

    def side(src: str, label: str) -> str:
        dense = f"""
      SELECT vocab.tok,
             CAST(coalesce(cs.c, 0) AS BIGINT) AS cnt_{label},
             CAST(coalesce(cs.c, 0) + 1 AS BIGINT) AS num,
             CAST(n.n + v1.V - coalesce(cs.c, 0) - 1 AS BIGINT) AS den
      FROM vocab
      LEFT JOIN (SELECT tok, c FROM counts WHERE source = '{src}') cs
        ON vocab.tok = cs.tok
      CROSS JOIN (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n
                  FROM counts WHERE source = '{src}') n
      CROSS JOIN v1"""
        return duckdb_ln_micro_sql(
            dense, "num", "den", f"lo_{label}",
            f"tok, cnt_{label}", prefix=f"_fw{label}")

    return f"""{base},
    sa AS MATERIALIZED ({side(src_a, 'a')}),
    sb AS MATERIALIZED ({side(src_b, 'b')})
    SELECT sa.tok, sa.cnt_a, sb.cnt_b,
           sa.lo_a - sb.lo_b AS delta_micro
    FROM sa JOIN sb ON sa.tok = sb.tok
    """
