"""Continuous temporal KG gates: incremental folding == batch recompute
for every arrival order (including retroactive backfill), untouched
buckets never rewritten wholesale, and the checkpointed stream drain is
exactly-once."""

import itertools

from augmented_codebase_indexer_spark.operators.temporal import scd2_intervals
from augmented_codebase_indexer_spark.sources.catalog import Warehouse
from augmented_codebase_indexer_spark.streaming.temporal_stream import (
    read_scd2,
    run_temporal_stream,
    temporal_increment,
)

FACTS = [
    ("E1", "ceo_of", "alice", 100),
    ("E1", "ceo_of", "bob", 300),
    ("E1", "ceo_of", "alice", 400),
    ("E2", "hq_in", "paris", 150),
    ("E2", "hq_in", "oslo", 500),
    ("E3", "cto_of", "carol", 250),
]

SCHEMA = "subj string, pred string, obj string, ts long"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _reference(spark, facts):
    return _rows(scd2_intervals(spark.createDataFrame(facts, SCHEMA)))


def test_increments_converge_any_arrival_order(spark, tmp_path_factory):
    """Every 3-batch split of the fact history, in several permutations
    (including ones that deliver LATER timestamps first), lands on the
    identical SCD2 table."""
    want = _reference(spark, FACTS)
    batches = [FACTS[0:2], FACTS[2:4], FACTS[4:6]]
    for order in itertools.permutations(range(3)):
        wh = Warehouse(str(tmp_path_factory.mktemp("wh_t")), "t")
        for i in order:
            temporal_increment(
                wh, spark.createDataFrame(batches[i], SCHEMA)
            )
        assert _rows(read_scd2(spark, wh)) == want, order


def test_retroactive_backfill_rewrites_only_affected_key(spark, tmp_path_factory):
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_bf")), "bf")
    temporal_increment(wh, spark.createDataFrame(FACTS, SCHEMA))
    before_e2 = [r for r in _rows(read_scd2(spark, wh)) if r[0] == "E2"]
    # backfill an EARLIER E1 observation: E1's chain gains a first version
    temporal_increment(
        wh, spark.createDataFrame([("E1", "ceo_of", "zed", 50)], SCHEMA)
    )
    got = _rows(read_scd2(spark, wh))
    assert got == _reference(spark, FACTS + [("E1", "ceo_of", "zed", 50)])
    # untouched key's rows identical
    assert [r for r in got if r[0] == "E2"] == before_e2


def test_duplicate_redelivery_is_idempotent(spark, tmp_path_factory):
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_dup")), "dup")
    temporal_increment(wh, spark.createDataFrame(FACTS, SCHEMA))
    before = _rows(read_scd2(spark, wh))
    temporal_increment(wh, spark.createDataFrame(FACTS[1:3], SCHEMA))
    assert _rows(read_scd2(spark, wh)) == before


def test_stream_drain_matches_batch_and_is_exactly_once(spark, tmp_path_factory):
    stream_in = str(tmp_path_factory.mktemp("t_stream_in"))
    ckpt = str(tmp_path_factory.mktemp("t_ckpt"))
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_ts")), "ts")

    spark.createDataFrame(FACTS[:3], SCHEMA).coalesce(1)\
        .write.mode("append").parquet(stream_in)
    run_temporal_stream(spark, stream_in, wh, ckpt).awaitTermination(300)
    spark.createDataFrame(FACTS[3:], SCHEMA).coalesce(1)\
        .write.mode("append").parquet(stream_in)
    run_temporal_stream(spark, stream_in, wh, ckpt).awaitTermination(300)

    assert _rows(read_scd2(spark, wh)) == _reference(spark, FACTS)
    before = _rows(read_scd2(spark, wh))
    run_temporal_stream(spark, stream_in, wh, ckpt).awaitTermination(300)
    assert _rows(read_scd2(spark, wh)) == before
