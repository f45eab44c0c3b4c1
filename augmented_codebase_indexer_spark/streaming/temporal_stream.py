"""Continuous temporal KG — crawl-timestamped facts as a stream, the
SCD2 interval table kept current, converging to the batch result no
matter how facts arrive (same contract as `curation_stream`).

Each micro-batch maintains two warehouse tables, both bucketed by the
entity key so per-trigger writes touch only affected buckets:

* ``fact_log`` — the deduped (key, ts) → min(val) observation log, the
  replay source `operators/temporal.scd2_merge` requires;
* ``scd2`` — version intervals, recomputed ONLY for keys present in the
  batch (their history replays from the fact_log's affected buckets
  union the batch) and swapped in via bucket-level upserts.

Out-of-order and retroactive facts need no special casing: replay is
total per affected key, so a backfilled early observation rewrites that
key's chain exactly as a from-scratch pass would (pytest-gated for
arbitrary arrival orders, mirroring ``scd2_merge``'s invariant).

Per-trigger cost: O(batch + affected-key history) — rows per key ≈
crawl count, and `Warehouse.upsert_buckets` rewrites only buckets
holding affected keys, never the whole table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import scd2_intervals
from ..sources.catalog import Warehouse

FACTS_SCHEMA = "subj string, pred string, obj string, ts long"
_SEP = "\x1f"


def _with_key(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    return df.withColumn("key", F.concat_ws(_SEP, *key_cols))


def temporal_increment(
    wh: Warehouse,
    batch_df: DataFrame,
    key_cols: Sequence[str] = ("subj", "pred"),
    ts_col: str = "ts",
    val_col: str = "obj",
    n_buckets: int = 8,
) -> None:
    """Fold one micro-batch of facts into fact_log + scd2."""
    spark = batch_df.sparkSession
    keys = list(key_cols)
    batch = _with_key(batch_df.select(*keys, ts_col, val_col), keys)
    batch_keys = batch.select("key").distinct().localCheckpoint(eager=True)

    if wh.exists("fact_log"):
        log = wh.read(spark, "fact_log").drop("bucket")
        affected_old = log.join(F.broadcast(batch_keys), "key", "left_semi")
    else:
        affected_old = batch.limit(0)

    # replay = old history of touched keys ∪ batch, deduped to the
    # (key, ts) → min(val) observation form both tables store
    replay = (
        affected_old.unionByName(batch)
        .groupBy("key", *keys, ts_col)
        .agg(F.min(val_col).alias(val_col))
        .localCheckpoint(eager=True)
    )
    recomputed = _with_key(
        scd2_intervals(replay.drop("key"), keys, ts_col, val_col), keys
    )

    wh.upsert_buckets(
        spark, "fact_log", replay, batch_keys, delete_col="key",
        bucket_col="key", n_buckets=n_buckets,
    )
    wh.upsert_buckets(
        spark, "scd2", recomputed, batch_keys, delete_col="key",
        bucket_col="key", n_buckets=n_buckets,
    )


def read_scd2(spark: SparkSession, wh: Warehouse) -> DataFrame:
    return wh.read(spark, "scd2").drop("key", "bucket")


def run_temporal_stream(
    spark: SparkSession,
    input_dir: str,
    wh: Warehouse,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Watch a directory of fact parquet files and keep the SCD2 table
    current (availableNow drains pending input and stops)."""
    stream = (
        spark.readStream.schema(FACTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        temporal_increment(wh, batch_df, **kwargs)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    trigger = {"availableNow": True} if available_now else {"processingTime": "2 seconds"}
    return writer.trigger(**trigger).start()
