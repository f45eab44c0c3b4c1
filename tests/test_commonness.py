"""Mention commonness prior (operators/anchors.py::mention_commonness):
ambiguous-anchor ranking, normalization, min_links denominator honesty,
DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.anchors import (
    mention_commonness,
    mention_commonness_sql,
)

# 'paris' points at the city 3x and the person 1x; 'Paris  Hilton '
# normalizes to a DIFFERENT mention; one singleton link
ANCHORS = [
    ("/city/paris", "Paris"),
    ("/city/paris", "paris"),
    ("/city/paris", " PARIS "),
    ("/person/hilton", "paris"),
    ("/person/hilton", "Paris  Hilton "),
    ("/fr", "france"),
    ("/x", "   "),  # whitespace-only anchor drops
]


def _df(spark):
    return spark.createDataFrame(ANCHORS, "href string, anchor string")


def test_prior_ranking_and_normalization(spark):
    rows = {
        (r["mention"], r["href"]): r
        for r in mention_commonness(_df(spark)).collect()
    }
    city = rows[("paris", "/city/paris")]
    person = rows[("paris", "/person/hilton")]
    # case/whitespace fold: 3 city links + 1 person link, shared total 4
    assert (city["n"], city["n_total"], city["rank"]) == (3, 4, 1)
    assert (person["n"], person["n_total"], person["rank"]) == (1, 4, 2)
    assert city["commonness_micro"] == 750000
    assert person["commonness_micro"] == 250000
    # multi-word mention is its own surface form, inner whitespace collapsed
    assert ("paris hilton", "/person/hilton") in rows
    assert rows[("paris hilton", "/person/hilton")]["commonness_micro"] == 1000000
    assert not any(m == "" for m, _ in rows)


def test_min_links_keeps_denominator(spark):
    rows = [
        tuple(r)
        for r in mention_commonness(_df(spark), min_links=2).collect()
    ]
    # the person candidate (n=1) is pruned but the city's total stays 4
    assert ("paris", "/city/paris", 3, 4, 750000, 1) in rows
    assert all(n >= 2 for _, _, n, *_ in rows)


def test_matches_duckdb_oracle(spark):
    anchors_sql = " UNION ALL ".join(
        f"SELECT '{h}' AS href, '{a}' AS anchor" for h, a in ANCHORS
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        mention_commonness_sql(anchors_sql)).fetchall())
    got = sorted(tuple(r) for r in mention_commonness(_df(spark)).collect())
    assert got == want and len(got) == 4
