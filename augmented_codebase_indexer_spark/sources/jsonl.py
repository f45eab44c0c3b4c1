"""JSONL source reader — WET/CC-Net-shaped ingestion for pre-extracted
web text (one JSON object per line: url, ts, text, lang, …).

The other common Common-Crawl consumption path besides raw WARC
(``sources/warc.py``): most public curation pipelines (CC-Net, C4,
RefinedWeb reproductions) start from line-delimited JSON of already-
extracted text. This reader turns such files into the pages/documents
shape the rest of the engine consumes.

Scale rules encoded here:
* the schema is EXPLICIT — ``spark.read.json`` without one makes a full
  inference pre-pass over the data (a second 100 TB scan);
* PERMISSIVE mode with a captured corrupt-record column — a single
  malformed line among 10^12 must neither kill the job (FAILFAST) nor
  vanish silently (DROPMALFORMED): bad lines are counted and returned as
  a side output, same no-silent-drops policy as the dedup bucket caps;
* JSONL is line-splittable, so unlike WARC the unit of parallelism is
  the HDFS/parquet-style split, not the file — no custom partitioning
  needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JSONL_SCHEMA = (
    "url string, ts timestamp, text string, lang string, _corrupt string"
)


def read_jsonl_docs(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """→ (docs, corrupt): ``docs`` has (doc_id, url, warc_ts, text, lang)
    with a deterministic 63-bit id from the url; ``corrupt`` carries the
    raw bad lines for quarantine/alerting."""
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        # Spark refuses queries that reference ONLY the corrupt-record
        # column on a raw JSON source; caching the parsed frame is the
        # workaround its own error message prescribes (and the corrupt
        # side output is always read together with docs anyway)
        .cache()
    )
    docs = (
        raw.filter(F.col("_corrupt").isNull() & F.col("url").isNotNull())
        .select(
            F.abs(F.xxhash64("url")).alias("doc_id"),
            "url",
            F.col("ts").alias("warc_ts"),
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("lang", F.lit("unknown")).alias("lang"),
        )
    )
    corrupt = raw.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line")
    )
    return docs, corrupt
