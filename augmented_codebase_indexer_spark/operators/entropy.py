"""Unigram entropy per document — Shannon entropy of the token
distribution, the information-density screen between the surface
ratios (`operators/textstats.py`, Gopher rules) and the LM scorers
(`operators/lmquality.py`): keyword-stuffed spam, templated listings
and copy-paste repetition sit at LOW entropy for their length, while
natural prose tracks a predictable entropy-vs-length curve (Shannon
1951 bounds; repetition_stats holds the adjacent max-run form).

    H = ln T − (Σ_w c_w·ln c_w) / T        (nats, micro units)

Exactness: every ln comes from the libm-free fixed-point log
(`functions/intlog.py`) evaluated once per DISTINCT count value (the
{c_w} ∪ {T} vocabulary — small integers, tiny next to the corpus) and
joined back broadcast; the per-doc fold is BIGINT sum / one truncating
division each.  ``entropy_micro`` is exact micro-nats; the normalized
``efficiency_micro = H·1e6 DIV ln(n_tokens)`` divides by the maximum
entropy achievable at that LENGTH (all tokens distinct), not by
ln(n_distinct): a uniformly repeated phrase is maximal over its own
alphabet, so the alphabet-normalized form would score keyword-stuffing
at 1.0 — the length-normalized form scores it ln k / ln(m·k) < 1,
which is the repetition penalty curation thresholds want.  One-token
docs (no distribution) score 0.

Scale shape at 10^12 docs: one tokenize+explode projection, one
(doc, token) groupBy (map-side combined), one doc-keyed fold — plus
two broadcast joins against the count-vocabulary ln table.  Token
text never survives the first groupBy (counts do).

Reference anchor: the reference's chunk-quality heuristics reject
low-information blocks before embedding (`src/aci/core/chunker/
chunker.py` filters) — entropy is the principled form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.functions.intlog import (
    duckdb_ln_micro_sql,
    with_ln_micro,
)

MICRO = 1_000_000


def unigram_entropy(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_tokens, n_distinct, entropy_micro,
    efficiency_micro): per non-empty document, the token-distribution
    entropy in micro-nats and its ratio to ln(n_tokens), the maximum
    achievable at that length (0 for one-token docs).  Token-free docs
    are absent (no distribution to measure)."""
    from augmented_codebase_indexer_spark.operators.guards import (
        register_pin,
    )

    counts = register_pin(
        docs.selectExpr(
            f"{doc_col} AS doc_id",
            f"explode(filter(split(lower({text_col}), '[^a-z0-9]+'),"
            " x -> x <> '')) AS tok",
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("c"))
        .persist()
    )
    vals = (
        counts.select(F.col("c").alias("val"))
        .union(
            counts.groupBy("doc_id").agg(F.sum("c").alias("val"))
            .select("val")
        )
        .distinct()
    )
    lnt = register_pin(
        with_ln_micro(vals, "val", "1", "lnv").persist()
    )
    per_doc = (
        counts.join(F.broadcast(lnt.selectExpr("val AS c", "lnv AS lnc")),
                    "c")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct"),
            F.sum(F.col("c") * F.col("lnc")).alias("clnc"),
        )
    )
    return (
        per_doc.join(
            F.broadcast(lnt.selectExpr("val AS n_tokens", "lnv AS lnT")),
            "n_tokens",
        )
        .selectExpr(
            "doc_id", "n_tokens", "n_distinct",
            "lnT - clnc DIV n_tokens AS entropy_micro",
            "lnT",
        )
        .selectExpr(
            "doc_id", "n_tokens", "n_distinct", "entropy_micro",
            f"CASE WHEN n_tokens = 1 THEN 0 "
            f"ELSE entropy_micro * {MICRO} DIV lnT END"
            " AS efficiency_micro",
        )
    )


def unigram_entropy_oracle_sql(docs_sql: str) -> str:
    """DuckDB mirror: same tokenization, same count-vocabulary intlog
    table, same folds and guards."""
    lnt = duckdb_ln_micro_sql(
        "SELECT val FROM vals", "val", "1", "lnv", "val"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
        regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        x -> x <> '')) AS tok
      FROM ({docs_sql})),
    counts AS MATERIALIZED (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, tok),
    vals AS MATERIALIZED (
      SELECT DISTINCT val FROM (
        SELECT c AS val FROM counts
        UNION ALL SELECT sum(c) FROM counts GROUP BY doc_id)),
    lnt AS MATERIALIZED ({lnt}),
    per_doc AS (
      SELECT cn.doc_id, sum(cn.c) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
             sum(cn.c * l.lnv) AS clnc
      FROM counts cn JOIN lnt l ON l.val = cn.c
      GROUP BY cn.doc_id)
    SELECT p.doc_id, p.n_tokens, p.n_distinct,
           lt.lnv - p.clnc // p.n_tokens AS entropy_micro,
           CASE WHEN p.n_tokens = 1 THEN 0
                ELSE (lt.lnv - p.clnc // p.n_tokens) * {MICRO} // lt.lnv
           END AS efficiency_micro
    FROM per_doc p JOIN lnt lt ON lt.val = p.n_tokens
    """
