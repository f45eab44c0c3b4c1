"""Continuous schema induction (streaming/schema_stream.py): batch
permutations converge to the one-shot induction, redelivery is
idempotent, the real stream drains exactly-once."""

from augmented_codebase_indexer_spark.operators.typeinduction import (
    induce_domain_range,
)
from augmented_codebase_indexer_spark.sources.catalog import Warehouse
from augmented_codebase_indexer_spark.streaming.schema_stream import (
    FACTS_SCHEMA,
    run_schema_stream,
    schema_increment,
)

FACTS = [
    ("p1", "works_at", "acme"), ("p2", "works_at", "globex"),
    ("p3", "works_at", "acme"), ("bot9", "works_at", "acme"),
    ("p1", "lives_in", "paris"), ("p2", "lives_in", "c9"),
    ("x1", "tie_pred", "z1"), ("x2", "tie_pred", "z2"),
]
TYPES = [
    ("p1", "person"), ("p2", "person"), ("p3", "person"),
    ("bot9", "bot"), ("acme", "org"), ("globex", "org"),
    ("paris", "city"), ("x1", "ta"), ("x2", "tb"),
]


def _types(spark):
    return spark.createDataFrame(TYPES, "entity string, type string")


def _one_shot(spark):
    return sorted(tuple(r) for r in induce_domain_range(
        spark.createDataFrame(FACTS, FACTS_SCHEMA),
        _types(spark)).collect())


def _induced(spark, wh):
    return sorted(tuple(r) for r in
                  wh.read(spark, "induced_schema").collect())


def test_permutations_converge(spark, tmp_path_factory):
    t = _types(spark)
    for order in ([FACTS[:3], FACTS[3:6], FACTS[6:]],
                  [FACTS[5:], FACTS[2:6], FACTS[:4]]):  # overlapping too
        wh = Warehouse(str(tmp_path_factory.mktemp("wh_perm")), "p")
        for chunk in order:
            schema_increment(
                wh, spark.createDataFrame(chunk, FACTS_SCHEMA), t)
        assert _induced(spark, wh) == _one_shot(spark)


def test_redelivery_idempotent(spark, tmp_path_factory):
    t = _types(spark)
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_dup")), "d")
    schema_increment(wh, spark.createDataFrame(FACTS, FACTS_SCHEMA), t)
    before = _induced(spark, wh)
    state_before = sorted(tuple(r) for r in
                          wh.read(spark, "induction_state").collect())
    schema_increment(
        wh, spark.createDataFrame(FACTS[2:5], FACTS_SCHEMA), t)
    assert _induced(spark, wh) == before
    assert sorted(tuple(r) for r in
                  wh.read(spark, "induction_state").collect()) \
        == state_before


def test_stream_drain_matches_one_shot(spark, tmp_path_factory):
    stream_in = str(tmp_path_factory.mktemp("s_in"))
    ckpt = str(tmp_path_factory.mktemp("s_ckpt"))
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_ss")), "ss")
    t = _types(spark)

    spark.createDataFrame(FACTS[:4], FACTS_SCHEMA).coalesce(1)\
        .write.mode("append").parquet(stream_in)
    run_schema_stream(spark, stream_in, wh, t, ckpt).awaitTermination(300)
    spark.createDataFrame(FACTS[4:], FACTS_SCHEMA).coalesce(1)\
        .write.mode("append").parquet(stream_in)
    run_schema_stream(spark, stream_in, wh, t, ckpt).awaitTermination(300)
    assert _induced(spark, wh) == _one_shot(spark)
    # a re-run over the drained directory changes nothing
    run_schema_stream(spark, stream_in, wh, t, ckpt).awaitTermination(300)
    assert _induced(spark, wh) == _one_shot(spark)
