"""Corpus-level curation filters: cross-doc boilerplate segment removal and
within-doc repetition stats."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.curation_filters import (
    boilerplate_prune,
    repetition_stats,
)


def test_boilerplate_prune_removes_cross_doc_segments(spark):
    banner = "subscribe to our newsletter today"
    rows = [(i, f"unique fact number {i}. {banner}. more text {i}") for i in range(6)]
    rows.append((99, "a document with no boilerplate at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in boilerplate_prune(df, min_df=3).collect()}
    for i in range(6):
        assert banner not in out[i]["clean_text"]
        assert out[i]["clean_text"] == f"unique fact number {i}. more text {i}"
        assert out[i]["n_removed"] == 1 and out[i]["n_kept"] == 2
    # unique content untouched
    assert out[99]["n_removed"] == 0
    assert out[99]["clean_text"] == "a document with no boilerplate at all"


def test_boilerplate_prune_all_removed_doc_survives_empty(spark):
    df = spark.createDataFrame(
        [(i, "same text everywhere") for i in range(5)], "doc_id long, text string"
    )
    out = boilerplate_prune(df, min_df=3).collect()
    assert len(out) == 5
    assert all(r["clean_text"] == "" and r["n_kept"] == 0 and r["n_removed"] == 1
               for r in out)


def test_repetition_stats_fractions(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # 2-grams: [ab, ba, ab, ba, ab] → 2/5 distinct
            (2, "all words here are distinct tokens"),
            (3, "x"),                     # too short for any gram
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert abs(out[1]["dup_2gram_frac"] - (1 - 2 / 5)) < 1e-6
    assert out[2]["dup_2gram_frac"] == 0.0 and out[2]["dup_3gram_frac"] == 0.0
    assert out[3]["dup_2gram_frac"] == 0.0 and out[3]["n_tokens"] == 1
    # 3-grams of doc 1: [aba, bab, aba, bab] → 2/4 distinct
    assert abs(out[1]["dup_3gram_frac"] - 0.5) < 1e-6


def test_repetition_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
