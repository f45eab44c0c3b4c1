"""r7 optimization gate: the codegen aggregate SimHash form must be
bit-identical to the nested-array expression form it replaced in the
near-duplicate path (same votes, same majority bits, same 60-bit long)."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.dedup import (
    simhash_agg_table,
    simhash_near_duplicates,
    with_simhash,
)


def test_simhash_agg_form_matches_expr_form(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text about spark aggregation plans"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "one"),  # single token
        (6, "  "),   # blank → no tokens → absent from agg form, NULL in expr form
        (7, "repeated repeated repeated repeated words words words"),
        (8, "MiXeD CaSe TokEns lowercase before hashing"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    expr_form = {
        r["id"]: r["sim"]
        for r in with_simhash(df).collect()
        if r["sim"] is not None
    }
    agg_form = {r["id"]: r["sim"] for r in simhash_agg_table(df).collect()}
    assert agg_form == expr_form
    # blank doc must be absent (expr form nulls it; agg form emits no row)
    assert 6 not in agg_form


def test_simhash_near_duplicates_still_pairs_exact_dups(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "totally unrelated content goes here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = simhash_near_duplicates(df, max_hamming=3).collect()
    assert [(p["ida"], p["idb"], p["hamming"]) for p in pairs] == [(1, 2, 0)]
