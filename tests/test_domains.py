"""URL→host→registered-domain normalization: planted URL battery
(subdomains, multi-label suffixes, platform suffixes, ports, userinfo,
IPs, trailing dots, junk) and the DuckDB expression mirror."""

import duckdb

from augmented_codebase_indexer_spark.operators.domains import (
    domain_sql_expr,
    host_sql_expr,
    with_domain,
)

CASES = [
    # url, host, domain
    ("https://www.example.com/a/b?q=1", "www.example.com", "example.com"),
    ("http://example.com", "example.com", "example.com"),
    ("https://deep.sub.tree.example.org/x", "deep.sub.tree.example.org",
     "example.org"),
    ("http://news.bbc.co.uk:8080/page", "news.bbc.co.uk", "bbc.co.uk"),
    ("https://shop.example.com.au/item", "shop.example.com.au",
     "example.com.au"),
    # the cap-gaming case: every blogspot user is its own registrant
    ("https://alice.blogspot.com/post", "alice.blogspot.com",
     "alice.blogspot.com"),
    ("https://x.alice.blogspot.com/post", "x.alice.blogspot.com",
     "alice.blogspot.com"),
    ("https://team.github.io/repo", "team.github.io", "team.github.io"),
    ("https://bucket.s3.amazonaws.com/key", "bucket.s3.amazonaws.com",
     "bucket.s3.amazonaws.com"),
    ("http://user:pw@secure.example.net/login", "secure.example.net",
     "example.net"),
    ("http://192.168.4.250/index.html", "192.168.4.250", "192.168.4.250"),
    ("https://example.com./trailing-dot", "example.com", "example.com"),
    ("HTTPS://UPPER.Example.COM/Path", "upper.example.com", "example.com"),
    ("http://intranet-host/x", "intranet-host", "intranet-host"),
    ("ftp://files.example.co.jp/pub", "files.example.co.jp",
     "example.co.jp"),
    ("not a url at all", None, None),
    ("/relative/path/only", None, None),
]


def test_with_domain_planted_battery(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], "id long, url string"
    )
    got = {r["id"]: (r["host"], r["domain"])
           for r in with_domain(df).collect()}
    for i, (u, host, dom) in enumerate(CASES):
        assert got[i] == (host, dom), (u, got[i], (host, dom))


def test_duckdb_mirror_matches_spark(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], "id long, url string"
    )
    got = sorted((r["id"], r["host"], r["domain"])
                 for r in with_domain(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE urls (id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?, ?)",
                    [(i, u) for i, (u, _, _) in enumerate(CASES)])
    h = host_sql_expr("url")
    ora = sorted(tuple(r) for r in con.sql(
        f"SELECT id, {h} AS host, {domain_sql_expr(h)} AS domain FROM urls"
    ).fetchall())
    assert got == ora


def test_domain_normalization_is_narrow(spark):
    df = spark.createDataFrame([(1, "https://a.example.com/x")],
                               "id long, url string")
    plan = with_domain(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # folds into the scan — no join, no UDF


def test_domain_cap_composes_on_registered_domain(spark):
    """The point of normalization: subdomain spam cannot beat the quota."""
    from augmented_codebase_indexer_spark.operators.sampling import domain_cap

    rows = [(i, f"https://u{i}.blogspot.com/p") for i in range(4)]
    rows += [(10 + i, f"https://w{i}.farm.example.com/p") for i in range(6)]
    df = with_domain(spark.createDataFrame(rows, "doc_id long, url string"))
    capped = domain_cap(df, k=2, domain_col="domain")
    by_dom = {}
    for r in capped.collect():
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    # blogspot users are separate registrants: one row each, never capped
    assert all(len(v) == 1 for d, v in by_dom.items() if "blogspot" in d)
    assert len([d for d in by_dom if "blogspot" in d]) == 4
    # the link-farm's 6 subdomains collapse to example.com → only k=2 kept
    assert len(by_dom["example.com"]) == 2
