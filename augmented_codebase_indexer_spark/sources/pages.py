"""Page sources.

* ``read_corpus_pages`` — the synthetic webtext corpus written by
  ``corpus.generator.write_corpus`` (the pipeline's native input).
* ``derive_pages_from_documents`` — deterministically wraps the driver's
  ``documents`` parquet table into the input_hint page schema
  (url, warc_ts, html, text, lang), planting one relation sentence per
  document as pure doc_id arithmetic. Because the derivation is closed-form,
  an independent ANSI-SQL oracle (DuckDB) can reconstruct every expected
  triple WITHOUT running any of our code — the strongest possible
  correctness gate for the end-to-end pipeline.

Planted fact for doc_id = d (entities are 50 orgs "Entity0".."Entity49"):
    subj = "Entity" || (d % 50)
    obj  = "Entity" || ((d * 7 + 13) % 50)      -- provably != subj
    pred = PREDS[d % 6]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus.generator import entity_id
from ..functions.openie import PRED_CONNECTORS

PREDS = sorted(PRED_CONNECTORS)  # deterministic order, shared with the SQL oracle


def read_corpus_pages(spark: SparkSession, corpus_dir: str) -> DataFrame:
    return spark.read.parquet(f"{corpus_dir}/pages.parquet")


def entry_gazetteer_rows(n: int = 50) -> list[dict]:
    """Gazetteer for the derived-pages corpus: one org per EntityK alias."""
    rows = []
    for k in range(n):
        name = f"Entity{k}"
        rows.append(
            {
                "alias": name,
                "ent_id": entity_id(name, "org"),
                "canonical_name": name,
                "entity_type": "org",
                "ambiguity_group": 0,
            }
        )
    return rows


def _relation_sentence_sql_parts():
    """Spark Column for the planted relation sentence of each doc row."""
    subj = F.concat(F.lit("Entity"), (F.col("doc_id") % 50).cast("string"))
    obj = F.concat(F.lit("Entity"), ((F.col("doc_id") * 7 + 13) % 50).cast("string"))
    connector = F.element_at(
        F.array(*[F.lit(PRED_CONNECTORS[p]) for p in PREDS]),
        (F.col("doc_id") % 6 + 1).cast("int"),
    )
    sentence = F.concat(subj, F.lit(" "), connector, F.lit(" "), obj, F.lit("."))
    return subj, obj, sentence


def derive_pages_from_documents(
    spark: SparkSession, sf_dir: str, replicas: int = 1
) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → pages(input_hint).

    html = boilerplate nav + <p>text</p> + <p>relation sentence</p> + footer;
    built entirely with JVM-side expressions (concat/encode) — deriving half
    a million pages adds no Python cost to the bench.

    ``replicas`` > 1 scales the corpus deterministically for throughput
    benchmarks: each replica r re-derives every document with
    doc_id' = doc_id + r·10^6 (distinct urls and facts, same text)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicas > 1:
        # replicate WITHOUT shuffling the fat side: the documents table is
        # tiny (it's a seed), so broadcast it and stream the replica range —
        # partitioning comes from spark.range (≈ one per core), and the html
        # column is built partition-locally. A repartition here would shuffle
        # every derived html payload (measured 13 s vs 0 at 320k pages).
        # 3 partitions per core: a single straggler task no longer defines
        # the stage wall time (classic local-balance rule; on a real cluster
        # this is the 2-3x-tasks-per-slot guidance)
        n_parts = min(replicas, spark.sparkContext.defaultParallelism * 3)
        reps = spark.range(0, replicas, 1, n_parts).withColumnRenamed("id", "rep")
        docs = (
            reps.crossJoin(F.broadcast(docs))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
            .drop("rep")
        )
    _, obj, sentence = _relation_sentence_sql_parts()
    # nav carries a per-doc entity outlink (C8 input): <nav> is stripped
    # wholesale by the extractor, so extracted text stays byte-identical —
    # but outlink_edges() reads the raw html and recovers the link graph,
    # which is closed-form doc_id arithmetic the DuckDB oracle reconstructs.
    html_str = F.concat(
        F.lit('<html><head><meta charset="utf-8"></head><body>'
              '<nav><a href="/">home</a> <a href="/about">about</a> '
              '<a href="/entity/'),
        obj,
        F.lit('">related</a></nav><p>'),
        F.col("text"),
        F.lit("</p><p>"),
        sentence,
        F.lit("</p><footer><p>copyright 2026 docs.example</p></footer></body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("https://docs.example/"), F.col("source"), F.lit("/"),
            F.col("doc_id").cast("string")
        ).alias("url"),
        (F.to_timestamp(F.lit("2026-01-01 00:00:00")) +
         F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )


# The DuckDB-side mirror of the derivation, reused by several oracle_sql
# entries. Produces (url, subj, obj, pred, extracted) per document.
DERIVED_ORACLE_CTE = """
WITH derived AS (
  SELECT
    'https://docs.example/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
    doc_id,
    lang,
    text,
    'Entity' || CAST(doc_id % 50 AS VARCHAR) AS subj,
    'Entity' || CAST((doc_id * 7 + 13) % 50 AS VARCHAR) AS obj,
    CASE doc_id % 6
      WHEN 0 THEN 'acquired' WHEN 1 THEN 'founded_by' WHEN 2 THEN 'located_in'
      WHEN 3 THEN 'partnered_with' WHEN 4 THEN 'subsidiary_of' WHEN 5 THEN 'works_for'
    END AS pred,
    CASE doc_id % 6
      WHEN 0 THEN 'acquired' WHEN 1 THEN 'was founded by' WHEN 2 THEN 'is located in'
      WHEN 3 THEN 'partnered with' WHEN 4 THEN 'is a subsidiary of' WHEN 5 THEN 'works for'
    END AS connector
  FROM documents
)
"""
