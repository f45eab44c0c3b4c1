"""The counted broadcast guard (operators/guards.py): "small by
assumption" sets — near-dup losers, contaminated ids — broadcast only
below a row cap; above it the join degrades to a shuffled anti-join of
slim ids instead of OOMing the driver on a dirty web corpus (VERDICT r3
Wrong #2: published web dup rates are 20-50%, so a forced hint on the
loser set is a 100-TB hazard)."""

import pyspark.sql.functions as F  # noqa: F401
import pytest

from augmented_codebase_indexer_spark.operators.decontam import (
    decontaminate,
    decontaminate_filter,
)
from augmented_codebase_indexer_spark.operators.guards import guarded_broadcast
from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v4


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_auto_broadcast(spark):
    """Simulate the at-scale regime where the small side is NOT small: with
    auto-broadcast off, any BroadcastExchange in the plan can only come
    from a hint — exactly what the guard must not emit above the cap."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_guard_hints_below_cap(spark):
    small = spark.range(5).withColumnRenamed("id", "doc_id")
    big = spark.range(200).withColumnRenamed("id", "doc_id")
    j = big.join(guarded_broadcast(small, 100), "doc_id", "left_anti")
    assert "broadcast" in _optimized(j).lower()


def test_guard_degrades_above_cap(spark, no_auto_broadcast):
    over = spark.range(50).withColumnRenamed("id", "doc_id")
    big = spark.range(200).withColumnRenamed("id", "doc_id")
    j = big.join(guarded_broadcast(over, 10), "doc_id", "left_anti")
    assert "broadcast" not in _optimized(j).lower()
    rows = j.collect()
    assert len(rows) == 150  # still the right answer, shuffled
    assert "BroadcastExchange" not in _executed(j)


def _dirty_corpus(spark):
    """18 docs: 12 one near-dup cluster (≥30% of candidates lose cluster
    election) and 6 near-identical 'boat' docs, one of which (424 = 53·8)
    lands in the eval split so the other five are CONTAMINATED — both
    "small by assumption" sets are large here."""
    base = ("the quick brown fox jumps over a lazy dog and then it runs to "
            "the old river bank where the other animals wait for it in the "
            "morning sun with a calm mood")
    words = ["calm", "quiet", "soft", "slow", "warm", "cool",
             "mild", "still", "kind", "glad", "safe", "free"]
    rows = [(300 + i, base.replace("calm", w)) for i, w in enumerate(words)]
    for i in (424, 400, 401, 402, 403, 404):
        rows.append((i,
                     "a small boat drifts down the wide green valley while "
                     "birds sing in the tall trees and the warm wind moves "
                     f"over the quiet fields of corn near farm {i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


V4_KW = dict(size=10, overlap=0, boiler_min_df=99, decontam_n=5, eval_mod=53,
             near_threshold=0.5,
             gopher=dict(min_words=20, min_stopwords=1, min_frac_alpha=0.5,
                         max_dup_2gram=0.6))


def test_curation_v4_same_rows_with_guard_declining(spark, no_auto_broadcast):
    """≥30% of the corpus loses cluster election; with the cap forced below
    the loser count the pipeline still returns the identical chunk set."""
    df = _dirty_corpus(spark)
    hinted = curation_pipeline_v4(df, broadcast_max_rows=10_000, **V4_KW)
    guarded = curation_pipeline_v4(df, broadcast_max_rows=2, **V4_KW)
    a = sorted(map(tuple, hinted.collect()))
    b = sorted(map(tuple, guarded.collect()))
    assert a == b and len(a) > 0
    # fox cluster keeps its min id; the 11 losers and the 5 boats that
    # quote eval doc 424 are gone
    assert {r[0] for r in b} == {300}


def test_decontaminate_guard_declining_matches(spark, no_auto_broadcast):
    df = _dirty_corpus(spark)
    eval_docs = df.filter(F.col("doc_id") == 424)
    cands = df.filter(F.col("doc_id") != 424)
    hinted = decontaminate(cands, eval_docs, n=5, broadcast_max_rows=10_000)
    guarded = decontaminate(cands, eval_docs, n=5, broadcast_max_rows=1)
    assert sorted(map(tuple, hinted.collect())) == \
        sorted(map(tuple, guarded.collect()))
    assert "broadcast" in _optimized(hinted).lower()

    f_hint = decontaminate_filter(cands, eval_docs, n=5,
                                  broadcast_max_rows=10_000)
    f_guard = decontaminate_filter(cands, eval_docs, n=5, broadcast_max_rows=0)
    assert sorted(map(tuple, f_hint.collect())) == \
        sorted(map(tuple, f_guard.collect()))


def test_pin_scope_releases_local_checkpoints(spark):
    """pin_scope must ACTUALLY release localCheckpoint()'d frames.
    DataFrame.unpersist() only talks to the SQL cache manager — a no-op
    for a checkpoint's RDD-level pin — so guards._release goes through
    the LogicalRDD's own rdd. Regression test for the order-dependent
    HTTP-facade hygiene flake (r5): iteration checkpoints lingered in
    getPersistentRDDs() until an eventual JVM GC."""
    from augmented_codebase_indexer_spark.operators.guards import (
        pin_scope,
        register_pin,
    )

    def n_pinned():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = n_pinned()
    with pin_scope():
        # distinctive ranges: the SQL cache manager dedupes by plan, so a
        # frame another test already persisted (and leaked — no scope
        # active there) would alias ours and break the exact-count assert
        ck = register_pin(spark.range(777001, 777051).localCheckpoint(eager=True))
        pe = register_pin(spark.range(777001, 777051).selectExpr("id + 1 AS id").persist())
        assert ck.count() == pe.count() == 50
        assert n_pinned() >= base + 2
    # deterministic release on scope exit — both pin flavors
    assert n_pinned() == base
    # no active scope -> register_pin is a no-op passthrough
    df = register_pin(spark.range(888001, 888004).persist())
    assert df.count() == 3
    df.unpersist()
