"""Entity salience scoring — which entities is a page ABOUT, not just
which it mentions (Dunietz & Gillick EACL'14 "A new entity salience
task"; Gamon et al. WWW'13 use the same surface features at web scale).
The two classic dictionary-free features are mention frequency and
first-mention position: the subject of a page is named often and named
early.  Salience ranks feed KG construction twice — triple confidence
(facts about salient entities are better attested by the page) and
entity-centric document retrieval ("pages ABOUT X", not "pages
mentioning X").

Exactness: every feature is BIGINT by construction —
``freq_micro = n_mentions·1e6 DIV n_doc_mentions`` (share of the doc's
mentions), ``early_micro = 1e6 − least(first_pos·1e6 DIV n_tokens,
1e6)`` (position 0 scores 1e6, the doc's end 0), and the blend is one
truncating mean.  The per-doc rank is a row_number with the entity id
as the deterministic tie-break.

Scale shape at 10^12 mentions: one (doc, entity) groupBy collapses the
mention stream map-side; the per-doc totals aggregate the already-
grouped relation on its leading key (AQE reuses the exchange), token
counts join doc-keyed, and the rank window partitions by doc — state
bounded by entities-per-doc, never corpus-sized.  Nothing carries text.

Reference anchor: the reference orders search results by match score
(`src/aci/services/search_service.py` normalize_scores + rerank) —
salience is the same ranking discipline applied to the entity axis of
one document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def entity_salience(
    mentions: DataFrame,
    doc_tokens: DataFrame,
    doc_col: str = "doc_id",
    entity_col: str = "entity",
    pos_col: str = "pos",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """→ (doc_id, entity, n_mentions, first_pos, freq_micro,
    early_micro, salience_micro, rank): per document, every mentioned
    entity with its surface-salience features and deterministic rank
    (1 = the page's primary subject).

    ``mentions`` is (doc, entity, pos) with pos a 0-based token offset;
    ``doc_tokens`` is (doc, n_tokens).  Docs absent from ``doc_tokens``
    drop (inner join) — a mention stream without a length row is a
    pipeline bug worth surfacing as missing output, not a NULL score.
    """
    m = mentions.select(
        F.col(doc_col).alias("doc_id"),
        F.col(entity_col).alias("entity"),
        F.col(pos_col).cast("long").alias("pos"),
    )
    per_ent = m.groupBy("doc_id", "entity").agg(
        F.count("*").cast("long").alias("n_mentions"),
        F.min("pos").alias("first_pos"),
    )
    per_doc = per_ent.groupBy("doc_id").agg(
        F.sum("n_mentions").alias("n_doc_mentions")
    )
    toks = doc_tokens.select(
        F.col(doc_col).alias("doc_id"),
        F.greatest(F.col(tokens_col).cast("long"), F.lit(1)).alias("n_tokens"),
    )
    scored = (
        per_ent.join(per_doc, "doc_id")
        .join(toks, "doc_id")
        .selectExpr(
            "doc_id", "entity", "n_mentions", "first_pos",
            f"n_mentions * {MICRO} DIV n_doc_mentions AS freq_micro",
            f"{MICRO} - least(first_pos * {MICRO} DIV n_tokens, {MICRO})"
            " AS early_micro",
        )
        .selectExpr(
            "*", "(freq_micro + early_micro) DIV 2 AS salience_micro"
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("salience_micro").desc(), F.col("entity").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )


def entity_salience_oracle_sql(
    mentions_sql: str, doc_tokens_sql: str
) -> str:
    """DuckDB mirror: same grouping grain, same integer arithmetic,
    same deterministic rank tie-break."""
    return f"""
    WITH m AS (SELECT doc_id, entity, CAST(pos AS BIGINT) AS pos
               FROM ({mentions_sql})),
    per_ent AS (
      SELECT doc_id, entity, CAST(count(*) AS BIGINT) AS n_mentions,
             min(pos) AS first_pos
      FROM m GROUP BY doc_id, entity),
    per_doc AS (
      SELECT doc_id, sum(n_mentions) AS n_doc_mentions
      FROM per_ent GROUP BY doc_id),
    toks AS (SELECT doc_id,
                    greatest(CAST(n_tokens AS BIGINT), 1) AS n_tokens
             FROM ({doc_tokens_sql})),
    scored AS (
      SELECT e.doc_id, e.entity, e.n_mentions, e.first_pos,
             e.n_mentions * {MICRO} // d.n_doc_mentions AS freq_micro,
             {MICRO} - least(e.first_pos * {MICRO} // t.n_tokens,
                             {MICRO}) AS early_micro
      FROM per_ent e
      JOIN per_doc d ON d.doc_id = e.doc_id
      JOIN toks t ON t.doc_id = e.doc_id)
    SELECT doc_id, entity, n_mentions, first_pos, freq_micro,
           early_micro,
           (freq_micro + early_micro) // 2 AS salience_micro,
           CAST(row_number() OVER (
             PARTITION BY doc_id
             ORDER BY (freq_micro + early_micro) // 2 DESC, entity
           ) AS BIGINT) AS rank
    FROM scored
    """
