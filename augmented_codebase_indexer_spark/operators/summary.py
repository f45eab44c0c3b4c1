"""Template summary / multi-granularity artifact generation (C6 — the
reference's ``core/summary_generator.py:114-353`` builds template summaries
per artifact and ``core/summary_artifact.py:15-54`` types them by
granularity; the ``artifact_type`` column then feeds the F7 type filters).

Web-text re-expression: per document we emit typed artifact rows —

  * ``headline`` — the first sentence (text up to the first '. '), the
    template analog of the reference's signature line
  * ``abstract`` — the first two sentences, capped at ``abstract_max_chars``
    on a whole-word boundary (the reference truncates summaries the same
    way, ``summary_generator.py:288-310``)
  * ``stats``    — a templated one-liner ("<n> words, <m> sentences"),
    the metrics-summary analog

plus (via ``chunk_artifacts``) one ``chunk`` artifact per chunk from
``operators/chunking.py`` — the multi-granularity union the reference
searches over (doc-level vs chunk-level artifacts in one table).

All columns are built-in string expressions (split / regexp_count /
substring) — no UDF, SQL-mirrorable, so the driver's DuckDB oracle gates
the whole stage exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ABSTRACT_MAX_CHARS = 240


def summarize_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    abstract_max_chars: int = ABSTRACT_MAX_CHARS,
) -> DataFrame:
    """→ (doc_id, artifact_type, content, n_tokens) — 3 rows per doc."""
    text = F.col(text_col)
    sents = F.split(text, r"\. ")
    headline = F.concat(F.element_at(sents, 1), F.lit("."))
    two = F.concat_ws(". ", F.slice(sents, 1, 2))
    # cap on a whole-word boundary: cut at the last space before the limit
    cut = F.substring(two, 1, abstract_max_chars)
    abstract = F.when(F.length(two) <= abstract_max_chars, two).otherwise(
        F.substring(cut, 1, F.length(cut) - F.length(F.element_at(F.split(cut, " "), -1)) - 1)
    )
    n_words = F.size(F.split(text, " "))
    n_sents = F.size(sents)
    stats = F.concat(
        n_words.cast("string"), F.lit(" words, "), n_sents.cast("string"), F.lit(" sentences")
    )
    rows = F.array(
        F.struct(F.lit("headline").alias("artifact_type"), headline.alias("content")),
        F.struct(F.lit("abstract").alias("artifact_type"), abstract.alias("content")),
        F.struct(F.lit("stats").alias("artifact_type"), stats.alias("content")),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(rows).alias("a"))
        .select(
            "doc_id",
            F.col("a.artifact_type").alias("artifact_type"),
            F.col("a.content").alias("content"),
            F.size(F.split(F.col("a.content"), " ")).alias("n_tokens"),
        )
    )


def chunk_artifacts(chunks: DataFrame) -> DataFrame:
    """chunking output → artifact rows (artifact_type='chunk'), same schema
    as ``summarize_documents`` so both granularities union into one table
    (``summary_artifact.py:15-24`` granularity column analog)."""
    return chunks.select(
        "doc_id",
        F.lit("chunk").alias("artifact_type"),
        F.col("chunk_text").alias("content"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )


def artifact_table(df: DataFrame, size: int = 40, overlap: int = 10) -> DataFrame:
    """Doc-level summaries ∪ chunk-level artifacts — the multi-granularity
    table hybrid search filters by ``artifact_type`` (F7)."""
    from .chunking import chunk_documents

    docs = summarize_documents(df)
    chs = chunk_artifacts(chunk_documents(df, size=size, overlap=overlap))
    return docs.unionByName(chs)


def summary_oracle_sql(table: str = "documents",
                       abstract_max_chars: int = ABSTRACT_MAX_CHARS) -> str:
    """DuckDB mirror of ``summarize_documents``."""
    return f"""
    WITH base AS (
      SELECT doc_id, text,
             string_split_regex(text, '\\. ') AS sents,
             len(string_split(text, ' ')) AS n_words
      FROM {table}
    ),
    feats AS (
      SELECT doc_id,
             sents[1] || '.' AS headline,
             array_to_string(sents[1:2], '. ') AS two,
             n_words, len(sents) AS n_sents
      FROM base
    ),
    absr AS (
      SELECT doc_id, headline, n_words, n_sents,
             CASE WHEN length(two) <= {abstract_max_chars} THEN two
                  ELSE substr(substr(two, 1, {abstract_max_chars}), 1,
                       length(substr(two, 1, {abstract_max_chars}))
                       - length(string_split(substr(two, 1, {abstract_max_chars}), ' ')[-1]) - 1)
             END AS abstract
      FROM feats
    )
    SELECT doc_id, artifact_type, content,
           CAST(len(string_split(content, ' ')) AS INT) AS n_tokens
    FROM (
      SELECT doc_id, 'headline' AS artifact_type, headline AS content FROM absr
      UNION ALL
      SELECT doc_id, 'abstract', abstract FROM absr
      UNION ALL
      SELECT doc_id, 'stats', n_words || ' words, ' || n_sents || ' sentences' FROM absr
    )
    """
