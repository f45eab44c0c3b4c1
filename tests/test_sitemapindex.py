"""Sitemap index parsing (operators/sitemaps.py::parse_sitemapindex):
child discovery, lastmod forms, malformed leniency, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.sitemaps import (
    parse_sitemapindex,
    parse_sitemapindex_sql,
)

INDEXES = [
    ("https://a.x/sitemap.xml",
     "<sitemapindex>"
     "<sitemap><loc>https://a.x/s1.xml</loc>"
     "<lastmod>2026-01-02</lastmod></sitemap>"
     "<sitemap><loc>https://a.x/s2.xml</loc>"
     "<lastmod>2026-01-02T03:04:05+00:00</lastmod></sitemap>"
     "<sitemap><loc>https://a.x/s3.xml</loc></sitemap>"
     "<sitemap><lastmod>2026-01-01</lastmod></sitemap>"   # no loc → drop
     "<sitemap><loc>https://a.x/s4.xml</loc>"
     "<lastmod>whenever</lastmod></sitemap>"               # junk → NULL
     "</sitemapindex>"),
    ("https://b.y/sitemap.xml", "<p>not xml at all</p>"),
]


def _df(spark):
    return spark.createDataFrame(INDEXES, "index_url string, xml string")


def test_parse(spark):
    rows = {r["sitemap_url"]: r
            for r in parse_sitemapindex(_df(spark)).collect()}
    assert set(rows) == {"https://a.x/s1.xml", "https://a.x/s2.xml",
                         "https://a.x/s3.xml", "https://a.x/s4.xml"}
    assert rows["https://a.x/s1.xml"]["lastmod_epoch"] == 1767312000
    assert rows["https://a.x/s2.xml"]["lastmod_epoch"] == 1767323045
    assert rows["https://a.x/s3.xml"]["lastmod_epoch"] is None
    assert rows["https://a.x/s4.xml"]["lastmod_epoch"] is None


def test_matches_duckdb_oracle(spark):
    i_sql = " UNION ALL ".join(
        "SELECT '{}' AS index_url, '{}' AS xml".format(
            u, x.replace("'", "''"))
        for u, x in INDEXES
    )
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(parse_sitemapindex_sql(i_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in parse_sitemapindex(_df(spark)).collect())
    assert got == want and len(got) == 4
