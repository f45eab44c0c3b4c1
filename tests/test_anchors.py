"""Anchor-text profiles (operators/anchors.py): extraction from html,
tokenize/count/rank semantics, tie-breaks, and DuckDB parity."""

import pyspark.sql.functions as F

from augmented_codebase_indexer_spark.operators.anchors import (
    anchor_profile,
    anchor_profile_sql,
    anchor_texts,
)

HTML = [
    ("u1", '<html><a href="/e/1">Acme Corp</a> text '
           '<a href="/e/1">acme!</a><a href="/e/2">Beta-Labs</a></html>'),
    ("u2", '<html><a href="/e/1">ACME corp</a>'
           '<a href="/e/2">beta</a><a href="/e/2"></a></html>'),  # empty anchor
    ("u3", "<html>no links at all</html>"),
]
# /e/1 terms: acme x3, corp x2 ; /e/2: beta x2, labs x1


def _pages(spark):
    return spark.createDataFrame(
        HTML, "url string, html_s string"
    ).select("url", F.encode("html_s", "UTF-8").alias("html"))


def test_anchor_extraction(spark):
    got = {(r["src_url"], r["href"], r["anchor"])
           for r in anchor_texts(_pages(spark)).collect()}
    assert got == {
        ("u1", "/e/1", "Acme Corp"), ("u1", "/e/1", "acme!"),
        ("u1", "/e/2", "Beta-Labs"),
        ("u2", "/e/1", "ACME corp"), ("u2", "/e/2", "beta"),
        ("u2", "/e/2", ""),
    }


def test_profile_counts_and_tiebreak(spark):
    prof = anchor_profile(anchor_texts(_pages(spark)), k=2)
    got = {(r["href"], r["rank"]): (r["tok"], r["n"])
           for r in prof.collect()}
    assert got == {
        ("/e/1", 1): ("acme", 3),
        ("/e/1", 2): ("corp", 2),
        ("/e/2", 1): ("beta", 2),
        # labs(1) vs beta(2): count wins; ties would break token-asc
        ("/e/2", 2): ("labs", 1),
    }


def test_oracle_parity(spark):
    import duckdb

    anchors = anchor_texts(_pages(spark))
    asql = " UNION ALL ".join(
        f"SELECT '{h}' AS href, '{a}' AS anchor"
        for _, h, a in (
            ("u1", "/e/1", "Acme Corp"), ("u1", "/e/1", "acme!"),
            ("u1", "/e/2", "Beta-Labs"),
            ("u2", "/e/1", "ACME corp"), ("u2", "/e/2", "beta"),
            ("u2", "/e/2", ""),
        ))
    got = sorted(map(tuple, anchor_profile(anchors, k=2).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        anchor_profile_sql(asql, k=2)).fetchall()))
    assert got == want
