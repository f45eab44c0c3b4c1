"""URL canonicalization (operators/urlnorm.py): every documented rule on
planted urls, Spark↔DuckDB parity, and the must-never-destroy pass-through."""

import duckdb
import pyspark.sql.functions as F  # noqa: F401

from augmented_codebase_indexer_spark.operators.urlnorm import (
    canonical_url_sql,
    with_canonical_url,
)

CASES = [
    # (input, expected canonical)
    ("http://Site.COM/a?utm_source=x&b=1#frag", "http://site.com/a?b=1"),
    ("http://site.com:80/a?b=1", "http://site.com/a?b=1"),
    ("https://site.com:443/", "https://site.com/"),
    ("https://site.com:8443/x", "https://site.com:8443/x"),  # non-default kept
    ("http://site.com:443/x", "http://site.com:443/x"),  # wrong-scheme port kept
    ("HTTP://A.B", "http://a.b/"),  # empty path -> /
    ("http://a.b/p?z=2&a=1&z=1", "http://a.b/p?a=1&z=1&z=2"),  # sorted, dups kept
    ("http://a.b/p?fbclid=abc&gclid=x", "http://a.b/p"),  # emptied query drops ?
    ("http://a.b/p?&&x=1&", "http://a.b/p?x=1"),  # empty params dropped
    ("http://a.b/p?utmost=1", "http://a.b/p?utmost=1"),  # utm_ prefix, not utm
    ("http://a.b/p?xutm_source=1", "http://a.b/p?xutm_source=1"),  # name-anchored
    ("ftp://site.com/file", "ftp://site.com/file"),  # non-http passes through
    ("not a url at all", "not a url at all"),  # unparseable passes through
    ("http://a.b/p%20q?b=%26&a=1", "http://a.b/p%20q?a=1&b=%26"),  # no %-decode
]


def test_canonical_rules(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    got = {r["i"]: r["canon_url"]
           for r in with_canonical_url(df).collect()}
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_oracle_parity(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    got = sorted((r["i"], r["canon_url"])
                 for r in with_canonical_url(df).collect())
    con = duckdb.connect()
    vals = " UNION ALL ".join(
        f"SELECT {i} AS i, '{u.replace(chr(39), chr(39) * 2)}' AS url"
        for i, (u, _) in enumerate(CASES))
    want = sorted(con.execute(
        f"SELECT i, {canonical_url_sql('url')} AS c FROM ({vals})"
    ).fetchall())
    assert got == want


def test_canonical_collapses_crawl_duplicates(spark):
    """The operational point: one page crawled under cosmetic URL
    variants groups to ONE canonical key."""
    variants = [
        "http://News.Example.com:80/story/42?utm_campaign=a",
        "http://news.example.com/story/42#top",
        "http://news.example.com/story/42?utm_source=feed&fbclid=z",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    keys = with_canonical_url(df).select("canon_url").distinct().collect()
    assert len(keys) == 1
    assert keys[0][0] == "http://news.example.com/story/42"
