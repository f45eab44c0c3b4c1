"""Training-mix sampling and hash splits: budget semantics, determinism,
and split stability under corpus growth."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.sampling import (
    hash_split,
    training_mix,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


def test_training_mix_budget_cut(spark):
    rows = [(i, "a", 100) for i in range(10)] + [(i + 100, "b", 100) for i in range(10)]
    out = training_mix(_docs(spark, rows), {"a": 350, "b": 1_000_000})
    got = out.groupBy("source").agg(
        F.count("*").alias("n"), F.max("cum_tokens").alias("cum")
    ).collect()
    by_src = {r["source"]: r for r in got}
    # 100-token docs under a 350 budget: docs admitted while cum-before < 350 → 4
    assert by_src["a"]["n"] == 4 and by_src["a"]["cum"] == 400
    assert by_src["b"]["n"] == 10  # budget covers everything


def test_training_mix_first_doc_always_admitted_and_unknown_source_dropped(spark):
    rows = [(1, "a", 500), (2, "a", 500), (3, "zzz", 5)]
    out = training_mix(_docs(spark, rows), {"a": 1}).collect()
    assert len(out) == 1 and out[0]["source"] == "a" and out[0]["mix_order"] == 1


def test_training_mix_deterministic_and_order_is_hash_not_id(spark):
    rows = [(i, "a", 10) for i in range(50)]
    a = training_mix(_docs(spark, rows), {"a": 200}).collect()
    b = training_mix(_docs(spark, rows), {"a": 200}).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    picked = [r["doc_id"] for r in sorted(a, key=lambda r: r["mix_order"])]
    assert picked != sorted(picked)  # hash order, not insertion/id order


def test_hash_split_stable_under_growth(spark):
    small = _docs(spark, [(i, "a", 1) for i in range(100)])
    big = _docs(spark, [(i, "a", 1) for i in range(300)])
    s1 = {r["doc_id"]: r["split"] for r in hash_split(small).collect()}
    s2 = {r["doc_id"]: r["split"] for r in hash_split(big).collect()}
    assert all(s2[k] == v for k, v in s1.items())  # old docs never move
    frac_val = sum(v == "val" for v in s2.values()) / len(s2)
    assert 0.03 < frac_val < 0.20  # ~10% with small-sample slack
