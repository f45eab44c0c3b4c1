"""Vocabulary-growth (Heaps-law) profile — cumulative type/token curve
over corpus ingestion order, with a libm-free local Heaps exponent.

Heaps' law (Heaps '78; Herdan '60): the number of distinct types V
after N running tokens grows as ``V ≈ K·N^β`` with β < 1. The curve is
the planning instrument for every vocabulary-sized structure in the
pipeline — LM vocab registers, HLL register widths, broadcast-gazetteer
caps: extrapolating V(N) to the 100-TB corpus says whether a
"vocabulary-sized" frame stays broadcastable. The LOCAL exponent
between consecutive checkpoints, ``β = Δln V / Δln N``, is the
diagnostic: natural text holds β ≈ 0.5±0.2; β → 0 means the corpus
stopped contributing new types (dedup saturated / crawl loop); β → 1
flags id-like token floods (the crawl-trap signature at type level).

Type arrival is computed exactly: a token's checkpoint is
``min(doc_id) DIV bucket_docs`` — one (tok) aggregate where token text
dies; cumulative sums then run at CHECKPOINT grain (corpus-size /
bucket_docs rows — hundreds, not data-sized), so the unpartitioned
window is over a bounded frame by construction. The exponent uses
``functions/intlog.py`` — the fixed-point BIGINT logarithm — so every
gated column stays engine-exact; first checkpoint and flat-N segments
yield NULL, never a division blowup.

Scale shape at 10^12 docs: one (doc-bucket) occurrence aggregate and
one (tok) first-seen aggregate (both map-side combined), then
everything downstream is checkpoint-cardinality. No join against
data-sized relations, no window over data-sized input.

Reference anchor: the reference sizes its symbol-interning tables from
a pre-scan (`core/symbols`); this is the growth law that pre-scan
should extrapolate with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from augmented_codebase_indexer_spark.functions.intlog import (
    duckdb_ln_micro_sql,
    with_ln_micro,
)

MICRO = 1_000_000


def vocab_growth(
    docs: DataFrame, bucket_docs: int = 50,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """docs(id, text) → one row per ingestion checkpoint:
    (checkpoint, tokens_cum, vocab_cum, new_types, beta_local_micro)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    occ = (
        toks.selectExpr(f"doc_id DIV {bucket_docs} AS checkpoint")
        .groupBy("checkpoint")
        .agg(F.count("*").cast("long").alias("n_occ"))
    )
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    new = (
        first.selectExpr(f"first_doc DIV {bucket_docs} AS checkpoint")
        .groupBy("checkpoint")
        .agg(F.count("*").cast("long").alias("new_types"))
    )
    g = occ.join(new, "checkpoint", "left").select(
        "checkpoint", "n_occ",
        F.coalesce(F.col("new_types"), F.lit(0)).cast("long")
        .alias("new_types"),
    )
    # checkpoint-cardinality frame: the unpartitioned window is bounded
    w = Window.orderBy("checkpoint").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = g.select(
        "checkpoint",
        F.sum("n_occ").over(w).cast("long").alias("tokens_cum"),
        F.sum("new_types").over(w).cast("long").alias("vocab_cum"),
        "new_types",
    )
    # r7: cut the plan between the two intlog towers (collocations-style —
    # composed towers cost superlinear Catalyst time; the frame is
    # checkpoint-cardinality, a handful of rows)
    from .guards import register_pin

    cum = with_ln_micro(cum, "vocab_cum", "1", "ln_v", prefix="_gv")
    cum = register_pin(cum.localCheckpoint(eager=True))
    cum = with_ln_micro(cum, "tokens_cum", "1", "ln_n", prefix="_gn")
    cum = register_pin(cum.localCheckpoint(eager=True))
    lw = Window.orderBy("checkpoint")
    lagd = cum.select(
        "*",
        F.lag("ln_v").over(lw).alias("_pv"),
        F.lag("ln_n").over(lw).alias("_pn"),
    )
    return lagd.selectExpr(
        "checkpoint", "tokens_cum", "vocab_cum", "new_types",
        "CASE WHEN _pv IS NULL OR ln_n - _pn <= 0 THEN NULL"
        f" ELSE (ln_v - _pv) * {MICRO} DIV (ln_n - _pn)"
        " END AS beta_local_micro",
    )


def vocab_growth_oracle_sql(docs_sql: str, bucket_docs: int = 50) -> str:
    """DuckDB mirror of :func:`vocab_growth` (same intlog chains)."""
    cum = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, t AS tok FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM ({docs_sql}))
      WHERE t <> ''),
    occ AS (
      SELECT doc_id // {bucket_docs} AS checkpoint,
             CAST(count(*) AS BIGINT) AS n_occ
      FROM toks GROUP BY 1),
    first AS (SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY tok),
    new AS (
      SELECT first_doc // {bucket_docs} AS checkpoint,
             CAST(count(*) AS BIGINT) AS new_types
      FROM first GROUP BY 1),
    g AS (
      SELECT o.checkpoint, o.n_occ,
             CAST(coalesce(n.new_types, 0) AS BIGINT) AS new_types
      FROM occ o LEFT JOIN new n USING (checkpoint))
    SELECT checkpoint,
           CAST(sum(n_occ) OVER w AS BIGINT) AS tokens_cum,
           CAST(sum(new_types) OVER w AS BIGINT) AS vocab_cum,
           new_types
    FROM g
    WINDOW w AS (ORDER BY checkpoint
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """
    with_lv = duckdb_ln_micro_sql(
        cum, "vocab_cum", "1", "ln_v",
        "checkpoint, tokens_cum, vocab_cum, new_types", prefix="_gv")
    with_ln = duckdb_ln_micro_sql(
        with_lv, "tokens_cum", "1", "ln_n",
        "checkpoint, tokens_cum, vocab_cum, new_types, ln_v", prefix="_gn")
    return f"""
    SELECT checkpoint, tokens_cum, vocab_cum, new_types,
           CASE WHEN _pv IS NULL OR ln_n - _pn <= 0 THEN NULL
                ELSE (ln_v - _pv) * {MICRO} // (ln_n - _pn)
           END AS beta_local_micro
    FROM (
      SELECT *, lag(ln_v) OVER (ORDER BY checkpoint) AS _pv,
                lag(ln_n) OVER (ORDER BY checkpoint) AS _pn
      FROM ({with_ln}))
    """
