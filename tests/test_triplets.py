"""Retrieval triplets (operators/triplets.py): filtered protocol
(positive and co-linked targets never drawn as negatives), anchor
normalization, determinism across parallelism, seed sensitivity,
DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.triplets import (
    retrieval_triplets,
    retrieval_triplets_oracle_sql,
)

ANCHORS = [
    ("Getting Started", "u1"), ("getting started ", "u1"),  # normalize
    ("getting started", "u2"),  # same query links u2 too → u2 is a
                                # false negative for this query
    ("api reference", "u3"),
    ("pricing", "u4"),
    ("", "u5"),                 # empty anchor → dropped
]


def _df(spark):
    return spark.createDataFrame(ANCHORS, "anchor string, target string")


def test_filtered_protocol_and_normalization(spark):
    rows = retrieval_triplets(_df(spark), k=4).collect()
    # the empty anchor contributes nothing
    assert all(r["query"] != "" for r in rows)
    linked = {("getting started", "u1"), ("getting started", "u2"),
              ("api reference", "u3"), ("pricing", "u4")}
    for r in rows:
        assert (r["query"], r["neg"]) not in linked  # filtered
        assert r["neg"] != r["pos"]
        assert (r["query"], r["pos"]) in linked      # real positives


def test_deterministic_and_seed_sensitive(spark):
    a = sorted(tuple(r) for r in retrieval_triplets(
        _df(spark), k=3, seed="s1").collect())
    b = sorted(tuple(r) for r in retrieval_triplets(
        _df(spark).repartition(7), k=3, seed="s1").collect())
    assert a == b  # parallelism-independent
    c = sorted(tuple(r) for r in retrieval_triplets(
        _df(spark), k=3, seed="s2").collect())
    assert a != c  # the seed actually steers the draw


def test_validation(spark):
    with pytest.raises(ValueError):
        retrieval_triplets(_df(spark), k=0)


def test_matches_duckdb_oracle(spark):
    a_sql = " UNION ALL ".join(
        f"SELECT '{a}' AS anchor, '{t}' AS target" for a, t in ANCHORS)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(retrieval_triplets_oracle_sql(a_sql, k=4)).fetchall()
    )
    got = sorted(
        tuple(r) for r in retrieval_triplets(_df(spark), k=4).collect())
    assert got == want and len(got) > 0
