"""Language-model quality scoring for training-data curation.

Two published web-pipeline operators the suite lacked:

* **CCNet-style perplexity filtering** (Wenzek et al. 2020, "CCNet:
  Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  score every document by its cross-entropy under a unigram LM trained on
  a trusted reference slice; junk pages (gibberish, navigation soup,
  keyword stuffing) score high, prose scores low. CCNet uses a KenLM
  5-gram model; the sandbox has no KenLM, so the LM here is an add-one
  unigram model built relationally from the corpus itself — the operator
  SHAPE (train counts → per-token log-probs → per-doc entropy → bucket)
  is the real thing and a KenLM scorer would slot into the same frames.
* **DSIR importance weights** (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): per-document
  log-likelihood ratio between a *target-domain* LM and a *raw-pool* LM;
  documents whose token distribution resembles the target get positive
  weights and are preferentially selected.

Cross-engine exactness (the repo's oracle discipline): per-token
log-probs are quantized ONCE per vocabulary entry to integer micro-nats
by the LIBM-FREE fixed-point binary log in ``functions/intlog.py``
(msb cascade + 20 mantissa squarings, pure BIGINT in both engines), so
every per-document score is a BIGINT sum — exact, order-independent,
and bit-identical between Spark and the DuckDB oracle BY CONSTRUCTION,
independent of either engine's libm build. Every GATED column is
integer-derived: ``ce_micro = (-sum_lp_micro) DIV n_tokens``
(truncating BIGINT division, identical in Spark ``DIV`` and DuckDB
``//``) and the ppl bucket is an integer cross-multiply against
micro-nat cut points. (History: round 4's red driver cell was
``round(ce, 6)`` half-way ties; round 5 made everything downstream
BIGINT but kept ``round(ln(p)·1e6)`` at the vocab quantize-once, and
the driver's DuckDB libm disagreed with the JVM's at ≥1 vocab point —
rows ✓ schema ✓ hash ✗ two rounds running. ``intlog`` removes libm
from the dataflow entirely; the ``lm_vocab`` entry gates the register
table itself so any future divergence bisects to vocab vs aggregation.)

Scale shape at 10^12 docs: the vocab build is one token-keyed shuffle
over the (much smaller) reference slice; scoring is a narrow
explode → broadcast-join → partial-agg chain — a document's exploded
tokens never leave its input partition, so the final ``groupBy(doc_id)``
exchanges ONE combined row per document, not token-level rows. The
vocab broadcast goes through ``guards.guarded_broadcast`` (CCNet prunes
its vocab anyway — ``max_vocab_rows`` mirrors that); above the cap the
join degrades to a token-keyed shuffle of fixed-width rows, never text.

Reference anchors: quality gating per scanned file
(`src/aci/core/scanner.py:283` caps what enters the index); the
reference's ranked retrieval normalizes scores before thresholding
(`src/aci/services/search_service.py:188-204`) — same
score-then-threshold shape, applied here at ingest time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.intlog import duckdb_ln_micro_sql, with_ln_micro
from .guards import guarded_broadcast, register_pin

# default head/middle/tail cross-entropy cut points (nats/token), tuned
# to the synthetic corpus (entropies cluster at 3.35-3.96 nats across
# sf0.001-0.1) so all three buckets are populated. CCNet derives its cuts
# from reference-corpus percentiles; fixed constants keep the operator
# free of any global-order pass (approx_percentile is the production path
# for data-driven cuts and is deliberately NOT in the oracle-gated output).
DEFAULT_BUCKETS = (3.40, 3.42)

_MICRO = 1_000_000.0


def token_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, tok) — whitespace tokens, empties dropped. Narrow."""
    return (
        docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )


def unigram_logprobs(
    ref_tokens: DataFrame, max_vocab_rows: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Add-one unigram LM from a (doc_id, tok) reference slice.

    Returns ``(vocab, totals)``: vocab is (tok, lp_micro BIGINT) with
    lp = ln((c+1)/(T+V+1)) in micro-nats via the libm-free integer log
    (``intlog.with_ln_micro``); totals is the 1-row (T, V, oov_lp_micro)
    frame (OOV mass = 1/(T+V+1)). ``max_vocab_rows`` keeps the top-K
    tokens by (count desc, tok) — CCNet-style pruning that guarantees
    the vocab broadcasts; pruned tokens fall into OOV on BOTH engines,
    so the oracle stays exact.
    """
    counts = ref_tokens.groupBy("tok").agg(F.count("*").alias("c"))
    if max_vocab_rows is not None:
        # exact global top-K as sort+limit: Spark plans this as
        # TakeOrderedAndProject (per-partition top-K, merged on the
        # driver) — distributed, unlike a row_number over an
        # unpartitioned window, which would drag EVERY distinct token
        # through one task
        counts = counts.orderBy(F.desc("c"), F.asc("tok")).limit(max_vocab_rows)
    # totals AND vocab both read the counts aggregation — pin it so the
    # reference-slice token shuffle runs once, not once per consumer
    # (vocab-sized rows: one per distinct token)
    counts = register_pin(counts.persist())
    # CUT LINEAGE at the chain outputs (r6): the intlog projection chain
    # (~44 plan nodes per log) has a fixed per-execution analyze+codegen
    # cost, and vocab/totals are consumed several times downstream
    # (guard count, broadcast, per-LM joins) INSIDE already-huge
    # composed plans (curation v5/v6) where every consumer re-carries
    # the chain through Catalyst. localCheckpoint materializes the
    # vocab-sized result eagerly and replaces the lineage with one
    # LogicalRDD node (measured A/B at sf0.1: dsir 7.0 s unpinned →
    # 2.7 s persisted → ~1.5 s checkpointed; the blocks are released by
    # guards.pin_scope, which handles LogicalRDD pins).
    totals = register_pin(
        with_ln_micro(
            counts.agg(
                F.sum("c").cast("long").alias("T"),
                F.count("*").cast("long").alias("V"),
            ),
            "1", "T + V + 1", "oov_lp_micro",
        ).localCheckpoint(eager=True)
    )
    vocab = register_pin(
        with_ln_micro(
            counts.crossJoin(F.broadcast(totals.select("T", "V"))),
            "c + 1", "T + V + 1", "lp_micro",
        ).select("tok", "lp_micro").localCheckpoint(eager=True)
    )
    return vocab, totals


def _doc_lp_sums(
    docs: DataFrame,
    vocab: DataFrame,
    totals: DataFrame,
    text_col: str,
    lp_alias: str,
    broadcast_max_rows: int | None,
) -> DataFrame:
    """(doc_id, n_tokens, <lp_alias> BIGINT) — exact micro-nat sums."""
    toks = token_frame(docs, text_col)
    scored = (
        toks.join(guarded_broadcast(vocab, broadcast_max_rows), "tok", "left")
        .crossJoin(F.broadcast(totals.select("oov_lp_micro")))
        .select(
            "doc_id", F.coalesce("lp_micro", "oov_lp_micro").alias("lp")
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("lp").cast("long").alias(lp_alias),
    )


def lm_cross_entropy(
    docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    buckets: tuple[float, float] = DEFAULT_BUCKETS,
    max_vocab_rows: int | None = None,
    broadcast_max_rows: int | None = None,
) -> DataFrame:
    """Score ``docs`` under an add-one unigram LM trained on ``ref_docs``.

    Returns (doc_id, n_tokens, sum_lp_micro, ce_micro, ppl_bucket) — all
    gated columns integer-exact. ``ce_micro`` is cross-entropy in
    micro-nats/token via truncating BIGINT division (Spark ``DIV`` ==
    DuckDB ``//`` toward zero; the operand is positive so floor == trunc);
    display nats/token = ce_micro / 1e6. The bucket compares
    ``-sum_lp_micro < cut_micro * n_tokens`` — pure BIGINT cross-multiply,
    so the exact rational entropy is bucketed with NO float round anywhere
    (the ``buckets`` cuts are quantized once to integer micro-nats). CCNet
    keeps head, samples middle, drops tail. Documents with no tokens are
    absent (nothing to score — callers union them back as 'tail' if
    desired).
    """
    vocab, totals = unigram_logprobs(
        token_frame(ref_docs, text_col), max_vocab_rows=max_vocab_rows
    )
    sums = _doc_lp_sums(
        docs, vocab, totals, text_col, "sum_lp_micro", broadcast_max_rows
    )
    lo_micro, hi_micro = (int(round(b * _MICRO)) for b in buckets)
    neg = -F.col("sum_lp_micro")
    return sums.select(
        "doc_id",
        "n_tokens",
        "sum_lp_micro",
        F.expr("(-sum_lp_micro) DIV n_tokens").alias("ce_micro"),
        F.when(neg < F.lit(lo_micro) * F.col("n_tokens"), F.lit("head"))
        .when(neg < F.lit(hi_micro) * F.col("n_tokens"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


def dsir_log_ratio(
    docs: DataFrame,
    target_docs: DataFrame,
    raw_docs: DataFrame | None = None,
    text_col: str = "text",
    max_vocab_rows: int | None = None,
    broadcast_max_rows: int | None = None,
) -> DataFrame:
    """DSIR importance weights: per-doc Σ[ln p_target(tok) − ln p_raw(tok)].

    ``raw_docs`` defaults to ``docs`` (the pool being selected from).
    Returns (doc_id, n_tokens, sum_llr_micro BIGINT, llr_per_tok_micro
    BIGINT): positive = looks more like the target domain than the raw
    pool — DSIR resamples with probability ∝ exp(weight). Both LMs use
    the same add-one estimator, so the BIGINT difference is exact, and
    the per-token column is truncating BIGINT division (Spark ``DIV`` and
    DuckDB ``//`` both truncate toward zero, including for the negative
    sums this column produces) — no float round in the gated output.
    """
    raw_docs = docs if raw_docs is None else raw_docs
    t_vocab, t_tot = unigram_logprobs(
        token_frame(target_docs, text_col), max_vocab_rows=max_vocab_rows
    )
    r_vocab, r_tot = unigram_logprobs(
        token_frame(raw_docs, text_col), max_vocab_rows=max_vocab_rows
    )
    t = _doc_lp_sums(docs, t_vocab, t_tot, text_col, "lp_t", broadcast_max_rows)
    r = _doc_lp_sums(docs, r_vocab, r_tot, text_col, "lp_r", broadcast_max_rows)
    joined = t.join(r.select("doc_id", "lp_r"), "doc_id")
    return joined.select(
        "doc_id",
        "n_tokens",
        (F.col("lp_t") - F.col("lp_r")).cast("long").alias("sum_llr_micro"),
        F.expr("(lp_t - lp_r) DIV n_tokens").alias("llr_per_tok_micro"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors (exact: the same micro-nat quantization)
# ---------------------------------------------------------------------------

def _vocab_ctes(prefix: str, src_pred: str) -> str:
    """CTE block building (tok, lp BIGINT) + 1-row OOV for one LM —
    log-probs via the libm-free nested-chain integer log (`intlog`)."""
    lp_sql = duckdb_ln_micro_sql(
        f"SELECT tok, c, T, V FROM {prefix}vocab, {prefix}tot",
        "c + 1", "T + V + 1", "lp", keep_cols="tok",
    )
    oov_sql = duckdb_ln_micro_sql(
        f"SELECT T, V FROM {prefix}tot", "1", "T + V + 1", "lp", keep_cols="",
    )
    return f"""
    {prefix}vocab AS (
      SELECT tok, count(*) AS c FROM tf WHERE {src_pred} GROUP BY tok),
    {prefix}tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS T, CAST(count(*) AS BIGINT) AS V
      FROM {prefix}vocab),
    {prefix}lp AS ({lp_sql}),
    {prefix}oov AS ({oov_sql})"""


def _tf_cte(table: str, with_source: bool) -> str:
    src = "source, " if with_source else ""
    return f"""
    WITH tk AS (
      SELECT doc_id, {src}unnest(string_split(text, ' ')) AS tok
      FROM {table}),
    tf AS (SELECT doc_id, {src}tok FROM tk WHERE tok <> '')"""


_TF_CTE = _tf_cte("documents", with_source=True)


def lm_vocab_oracle_sql(
    ref_pred: str = "doc_id % 10 = 0", table: str = "documents"
) -> str:
    """Gate the (tok, lp_micro) LM register table ITSELF (VERDICT r5
    Next #1a, the ``hll_vocab`` precedent): if a driver round ever
    disagrees on lm_quality again, this entry says whether the
    divergence is in the vocabulary quantization or the per-doc
    aggregation."""
    return f"""{_tf_cte(table, with_source=False)},{_vocab_ctes("u", ref_pred)}
    SELECT tok, lp AS lp_micro FROM ulp
    """


def lm_quality_oracle_sql(
    ref_pred: str = "doc_id % 10 = 0",
    buckets: tuple[float, float] = DEFAULT_BUCKETS,
    table: str = "documents",
) -> str:
    lo_micro, hi_micro = (int(round(b * _MICRO)) for b in buckets)
    # all-BIGINT mirror of the Spark frame: truncating // division and the
    # integer cross-multiply bucket — no float round anywhere in the gate
    neg = "CAST(-sum(lp) AS BIGINT)"
    return f"""{_tf_cte(table, with_source=False)},{_vocab_ctes("u", ref_pred)},
    scored AS (
      SELECT tf.doc_id, coalesce(ulp.lp, uoov.lp) AS lp
      FROM tf LEFT JOIN ulp USING (tok) CROSS JOIN uoov)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           sum(lp) AS sum_lp_micro,
           CAST({neg} // count(*) AS BIGINT) AS ce_micro,
           CASE WHEN {neg} < {lo_micro} * count(*) THEN 'head'
                WHEN {neg} < {hi_micro} * count(*) THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM scored GROUP BY doc_id
    """


def dsir_oracle_sql(target_pred: str = "source = 'src0'") -> str:
    return f"""{_TF_CTE},{_vocab_ctes("t", target_pred)},{_vocab_ctes("r", "TRUE")},
    scored AS (
      SELECT tf.doc_id,
             coalesce(tlp.lp, toov.lp) AS lt,
             coalesce(rlp.lp, roov.lp) AS lr
      FROM tf LEFT JOIN tlp USING (tok) LEFT JOIN rlp USING (tok)
      CROSS JOIN toov CROSS JOIN roov)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(lt) - sum(lr) AS BIGINT) AS sum_llr_micro,
           CAST((sum(lt) - sum(lr)) // count(*) AS BIGINT) AS llr_per_tok_micro
    FROM scored GROUP BY doc_id
    """
