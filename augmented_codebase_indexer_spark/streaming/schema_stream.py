"""Continuous schema induction — fact batches as a stream, the induced
domain/range table kept current, converging to the one-shot induction
no matter how facts arrive (the `temporal_stream`/`curation_stream`
contract).

Each micro-batch maintains three warehouse tables:

* ``fact_seen`` — the slim fact-hash relation (bucketed by hash), the
  exactly-once guard: a RE-DELIVERED batch anti-joins to nothing, so
  at-least-once delivery upstream still counts every fact once —
  idempotence is a property of the state machine, not of the source;
* ``induction_state`` — the algebraic (pred, end, type, cnt) evidence
  counts (pred-vocab × type-vocab × 2 rows, rewritten whole — tiny);
* ``induced_schema`` — the current induction, re-derived per trigger
  from the merged state.

Because `operators/typeinduction.induction_increment` is
batch-boundary invariant, the induced table after ANY prefix of the
stream equals the one-shot induction over exactly the facts delivered
so far — the pytest gate replays permutations and a duplicated
trigger and asserts equality with `induce_domain_range`.

Per-trigger cost: O(batch + seen-anti-join); the historical fact log
is never rescanned and the evidence state never grows past the
schema vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.typeinduction import induction_increment
from ..sources.catalog import Warehouse

FACTS_SCHEMA = "subj string, pred string, obj string"


def schema_increment(
    wh: Warehouse, batch_df: DataFrame, types: DataFrame,
    n_buckets: int = 8,
) -> None:
    """Fold one micro-batch of (subj, pred, obj) facts into
    fact_seen + induction_state + induced_schema."""
    spark = batch_df.sparkSession
    seen = (wh.read(spark, "fact_seen").drop("bucket")
            if wh.exists("fact_seen") else None)
    state = (wh.read(spark, "induction_state").drop("bucket")
             if wh.exists("induction_state") else None)
    induced, new_state, new_hashes = induction_increment(
        batch_df, types, state=state, seen=seen)
    # pin everything BEFORE any commit: the commits below atomically
    # swap the very directories `seen`/`state` were lazily read from
    induced = induced.localCheckpoint(eager=True)
    new_state = new_state.localCheckpoint(eager=True)
    all_seen = (
        (seen.select("h").unionByName(new_hashes) if seen is not None
         else new_hashes)
        .distinct().localCheckpoint(eager=True)
    )
    wh.commit(all_seen, "fact_seen", bucket_col="h", n_buckets=n_buckets)
    wh.commit(new_state, "induction_state")
    wh.commit(induced, "induced_schema")


def run_schema_stream(
    spark: SparkSession,
    input_dir: str,
    wh: Warehouse,
    types: DataFrame,
    checkpoint_dir: str,
    n_buckets: int = 8,
):
    """readStream over a landing directory of fact files →
    foreachBatch(schema_increment); returns the streaming query."""
    stream = (
        spark.readStream.schema(FACTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        schema_increment(wh, batch_df, types, n_buckets=n_buckets)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
