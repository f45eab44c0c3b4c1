"""Sitemap parsing + recrawl selection (operators/sitemaps.py): block
extraction, lastmod epoch parsing, NULL surfacing, new/modified/skip
semantics, and DuckDB parity."""

from augmented_codebase_indexer_spark.operators.sitemaps import (
    parse_sitemap,
    recrawl_candidates,
    recrawl_candidates_sql,
)

XML = (
    "<urlset>"
    "<url><loc>https://s.example/a</loc><lastmod>2026-01-02</lastmod></url>"
    "<url><loc>https://s.example/b</loc></url>"                # no lastmod
    "<url><loc>https://s.example/c</loc><lastmod>2026-01-05</lastmod></url>"
    "<url><lastmod>2026-01-01</lastmod></url>"                 # no loc: dropped
    "</urlset>"
)
EPOCH_0102 = 1767312000  # 2026-01-02 UTC
EPOCH_0105 = 1767571200  # 2026-01-05 UTC
# fetch log: a fetched AFTER its lastmod (skip), c fetched BEFORE (modified)
LOG = [("https://s.example/a", EPOCH_0102 + 999),
       ("https://s.example/c", EPOCH_0105 - 999)]


def _entries(spark):
    return parse_sitemap(
        spark.createDataFrame([("s.example", XML)], "domain string, xml string")
    )


def test_parse_blocks_and_epochs(spark):
    got = {r["loc"]: r["lastmod_epoch"] for r in _entries(spark).collect()}
    assert got == {
        "https://s.example/a": EPOCH_0102,
        "https://s.example/b": None,
        "https://s.example/c": EPOCH_0105,
    }


def test_w3c_datetime_and_malformed_lastmod(spark):
    """ADVICE r5: sitemaps.org explicitly allows full W3C datetimes in
    <lastmod>; plain to_timestamp under ANSI threw on them and killed
    the job. Full datetimes (Z and ±hh:mm zones, with/without seconds)
    must parse to the exact UTC epoch; garbage must surface NULL and
    never raise."""
    xml = (
        "<urlset>"
        "<url><loc>u1</loc><lastmod>2026-01-02T03:04:05+00:00</lastmod></url>"
        "<url><loc>u2</loc><lastmod>2026-01-02T03:04:05Z</lastmod></url>"
        "<url><loc>u3</loc><lastmod>2026-01-02T04:04:05+01:00</lastmod></url>"
        "<url><loc>u4</loc><lastmod>2026-01-02T03:04Z</lastmod></url>"
        "<url><loc>u5</loc><lastmod>next tuesday</lastmod></url>"
        "<url><loc>u6</loc><lastmod>2026-13-45</lastmod></url>"
        "</urlset>"
    )
    got = {r["loc"]: r["lastmod_epoch"] for r in parse_sitemap(
        spark.createDataFrame([("d", xml)], "domain string, xml string")
    ).collect()}
    t = EPOCH_0102 + 3 * 3600 + 4 * 60 + 5
    assert got == {
        "u1": t, "u2": t, "u3": t,  # +01:00 wall 04:04 == same instant
        "u4": t - 5,
        "u5": None, "u6": None,
    }


def test_recrawl_semantics(spark):
    log = spark.createDataFrame(LOG, "url string, fetched_at long")
    got = {r["url"]: r["reason"]
           for r in recrawl_candidates(_entries(spark), log).collect()}
    # a: fetched after lastmod → skip; b: never fetched → new (NULL
    # lastmod does NOT block a first fetch); c: modified since fetch
    assert got == {
        "https://s.example/b": "new",
        "https://s.example/c": "modified",
    }


def test_duckdb_parity(spark):
    import duckdb

    entries_sql = (
        f"SELECT 'https://s.example/a' AS loc, {EPOCH_0102} AS lastmod_epoch "
        "UNION ALL SELECT 'https://s.example/b', NULL "
        f"UNION ALL SELECT 'https://s.example/c', {EPOCH_0105}"
    )
    log_sql = " UNION ALL ".join(
        f"SELECT '{u}' AS url, {t} AS fetched_at" for u, t in LOG
    )
    log = spark.createDataFrame(LOG, "url string, fetched_at long")
    got = sorted(map(tuple,
                     recrawl_candidates(_entries(spark), log).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        recrawl_candidates_sql(entries_sql, log_sql)).fetchall()))
    assert got == want
