"""BGP matching (operators/bgp.py): binding semantics, constant pushdown,
repeated-var patterns, neq filters, cartesian rejection, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.bgp import (
    bgp_match,
    bgp_oracle_sql,
)

TRIPLES = [
    ("alice", "works_at", "acme"),
    ("bob", "works_at", "acme"),
    ("carol", "works_at", "globex"),
    ("alice", "born_in", "paris"),
    ("bob", "born_in", "lyon"),
    ("carol", "born_in", "paris"),
    ("acme", "located_in", "paris"),
    ("globex", "located_in", "lyon"),
    ("dup", "works_at", "acme"),
    ("dup", "works_at", "acme"),  # bag semantics: duplicate row survives
    ("narciso", "likes", "narciso"),
    ("erika", "likes", "narciso"),
]


def _t(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def test_two_pattern_join(spark):
    got = sorted(
        tuple(r)
        for r in bgp_match(
            _t(spark),
            [("?p", "works_at", "?c"), ("?p", "born_in", "?b")],
        ).collect()
    )
    assert got == [
        ("alice", "acme", "paris"),
        ("bob", "acme", "lyon"),
        ("carol", "globex", "paris"),
    ]


def test_three_pattern_chain_and_columns(spark):
    df = bgp_match(
        _t(spark),
        [
            ("?p", "works_at", "?c"),
            ("?c", "located_in", "?city"),
            ("?p", "born_in", "?city"),  # people working where they were born
        ],
    )
    assert df.columns == ["p", "c", "city"]
    assert sorted(tuple(r) for r in df.collect()) == [
        ("alice", "acme", "paris")
    ]


def test_bag_semantics_and_distinct(spark):
    pats = [("?p", "works_at", "acme")]
    assert bgp_match(_t(spark), pats).count() == 4  # dup row counted twice
    assert bgp_match(_t(spark), pats, distinct=True).count() == 3


def test_repeated_var_in_one_pattern(spark):
    got = [tuple(r) for r in bgp_match(
        _t(spark), [("?x", "likes", "?x")]).collect()]
    assert got == [("narciso",)]


def test_neq_filter(spark):
    got = sorted(tuple(r) for r in bgp_match(
        _t(spark),
        [("?a", "works_at", "?c"), ("?b", "works_at", "?c")],
        neq=[("a", "b")],
        distinct=True,
    ).collect())
    assert ("alice", "acme", "bob") in got
    assert all(a != b for a, _, b in got)


def test_cartesian_rejected(spark):
    with pytest.raises(ValueError, match="cartesian"):
        bgp_match(
            _t(spark),
            [("?a", "works_at", "?c"), ("?x", "born_in", "?y")],
        )
    with pytest.raises(ValueError):
        bgp_match(_t(spark), [])
    with pytest.raises(ValueError, match="binds no variable"):
        bgp_match(_t(spark), [("alice", "works_at", "acme")])


def test_matches_duckdb_oracle(spark):
    triples_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in TRIPLES
    )
    pats = [
        ("?p", "works_at", "?c"),
        ("?c", "located_in", "?city"),
    ]
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        bgp_oracle_sql(triples_sql, pats, neq=[("p", "city")])).fetchall())
    got = sorted(tuple(r) for r in bgp_match(
        _t(spark), pats, neq=[("p", "city")]).collect())
    assert got == want and len(got) > 0
