"""robots.txt compliance (operators/robots.py): RFC 9309 parse +
longest-match precedence on planted files covering every rule the
operator claims — group attachment, agent-specific override, wildcard /
anchor patterns, allow-wins-ties, unmatched-is-allowed."""

import pyspark.sql.functions as F  # noqa: F401

from augmented_codebase_indexer_spark.operators.robots import (
    apply_robots,
    parse_robots,
)

ROBOTS = """\
# crawl policy
User-agent: *
Disallow: /private/
Allow: /private/press
Disallow: /tmp*.html
Disallow: /exact$

User-agent: greedy-bot
User-agent: aci-bot
Disallow: /
Allow: /docs/
"""


def _robots_df(spark, domain="a.example.com", text=ROBOTS):
    return spark.createDataFrame(
        [(domain, text)], "domain string, robots_txt string")


def _urls_df(spark, paths, domain="a.example.com"):
    return spark.createDataFrame(
        [(i, f"https://{domain}{p}") for i, p in enumerate(paths)],
        "doc_id long, url string")


def test_parse_groups_and_rules(spark):
    rules = {
        (r["agent"], r["rule"], r["pattern"]): r["pat_len"]
        for r in parse_robots(_robots_df(spark)).collect()
    }
    # the two consecutive User-agent lines share ONE group's rules
    assert rules[("greedy-bot", "disallow", "/")] == 1
    assert rules[("aci-bot", "disallow", "/")] == 1
    assert rules[("aci-bot", "allow", "/docs/")] == 6
    assert rules[("*", "disallow", "/private/")] == 9
    # comments stripped, no empty-pattern rows
    assert all(p for (_, _, p) in rules)


def test_rules_before_any_group_are_dropped(spark):
    df = _robots_df(spark, text="Disallow: /lost\nUser-agent: *\nDisallow: /kept\n")
    got = {(r["agent"], r["pattern"]) for r in parse_robots(df).collect()}
    assert got == {("*", "/kept")}


def _verdicts(spark, agent, paths, text=ROBOTS):
    rules = parse_robots(_robots_df(spark, text=text))
    out = apply_robots(_urls_df(spark, paths), rules, agent=agent)
    return {r["url"].split(".com", 1)[1]: (r["robots_allowed"],
                                           r["matched_pattern"])
            for r in out.collect()}


def test_star_group_longest_match_and_anchors(spark):
    v = _verdicts(spark, "other-bot", [
        "/private/x", "/private/press/1", "/public", "/tmp_99.html",
        "/tmpX.html", "/exact", "/exact/sub", "/",
    ])
    assert v["/private/x"] == (False, "/private/")
    # longer Allow overrides the Disallow prefix
    assert v["/private/press/1"] == (True, "/private/press")
    assert v["/public"][0] is True and v["/public"][1] is None  # no match
    # '*' wildcard spans, and LIKE metachars in the path are literal
    assert v["/tmp_99.html"] == (False, "/tmp*.html")
    assert v["/tmpX.html"] == (False, "/tmp*.html")
    # '$' anchors: /exact blocked, /exact/sub unmatched -> allowed
    assert v["/exact"] == (False, "/exact$")
    assert v["/exact/sub"] == (True, None)
    assert v["/"] == (True, None)


def test_exact_agent_group_excludes_star_group(spark):
    # RFC 9309: when an aci-bot group exists, the * group does NOT apply
    v = _verdicts(spark, "aci-bot", ["/private/press/1", "/docs/a", "/x"])
    assert v["/docs/a"] == (True, "/docs/")
    assert v["/x"] == (False, "/")
    # the * group's Allow: /private/press is NOT consulted for aci-bot
    assert v["/private/press/1"] == (False, "/")


def test_allow_wins_equal_length_tie(spark):
    text = "User-agent: *\nDisallow: /a/b\nAllow: /a/c\nAllow: /dup\nDisallow: /dup\n"
    v = _verdicts(spark, "any", ["/dup/x"], text=text)
    assert v["/dup/x"] == (True, "/dup")


def test_domain_without_robots_is_allowed(spark):
    rules = parse_robots(_robots_df(spark))
    urls = _urls_df(spark, ["/private/x"], domain="other.example.com")
    row = apply_robots(urls, rules, agent="aci-bot").collect()[0]
    assert row["robots_allowed"] is True and row["matched_rule"] == "no_match"


def test_oracle_parity_on_planted_corpus(spark, duckdb_conn=None):
    """Spark vs DuckDB on the same planted urls+robots — the full
    apply path (parse, group choice, LIKE compile, precedence)."""
    import duckdb

    from augmented_codebase_indexer_spark.operators.robots import (
        apply_robots_oracle_sql,
    )

    paths = ["/private/x", "/private/press/1", "/docs/a", "/tmp9.html",
             "/exact", "/exact/sub", "/", "/dup"]
    urls = _urls_df(spark, paths)
    rules = parse_robots(_robots_df(spark))
    got = sorted(
        (r["doc_id"], r["robots_allowed"], r["matched_rule"],
         r["matched_pattern"])
        for r in apply_robots(urls, rules, agent="aci-bot").collect()
    )
    con = duckdb.connect()
    urls_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, 'https://a.example.com{p}' AS url"
        for i, p in enumerate(paths))
    robots_sql = ("SELECT 'a.example.com' AS domain, '"
                  + ROBOTS.replace("\n", "' || chr(10) || '") + "' AS robots_txt")
    want = sorted(
        (r[0], r[2], r[3], r[4])
        for r in con.execute(
            apply_robots_oracle_sql(urls_sql, robots_sql, "aci-bot")
        ).fetchall()
    )
    assert got == want


def test_oracle_parity_with_port_and_userinfo(spark):
    """ADVICE r5: the oracle's old '[^/?#]+' authority regex kept ':port'
    and 'userinfo@' while Spark's host_col strips both, so such URLs
    matched DIFFERENT robots domains across engines. Both engines must
    now gate 'https://user@a.example.com:8443/private/x' by
    a.example.com's rules."""
    import duckdb

    from augmented_codebase_indexer_spark.operators.robots import (
        apply_robots_oracle_sql,
    )

    urls = [
        "https://a.example.com:8443/private/x",
        "https://user@a.example.com/private/press/1",
        "https://user:pw@a.example.com:8080/docs/a",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    rules = parse_robots(_robots_df(spark))
    got = sorted(
        (r["doc_id"], r["robots_allowed"], r["matched_rule"])
        for r in apply_robots(df, rules, agent="aci-bot").collect()
    )
    # the port/userinfo urls hit a.example.com's groups — not no_match
    assert all(rule != "no_match" for _, _, rule in got)
    con = duckdb.connect()
    urls_sql = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{u}' AS url" for i, u in enumerate(urls)
    )
    robots_sql = ("SELECT 'a.example.com' AS domain, '"
                  + ROBOTS.replace("\n", "' || chr(10) || '") + "' AS robots_txt")
    want = sorted(
        (r[0], r[2], r[3])
        for r in con.execute(
            apply_robots_oracle_sql(urls_sql, robots_sql, "aci-bot")
        ).fetchall()
    )
    assert got == want


class TestRobotsSitemaps:
    ROBOTS = [
        ("a.example",
         "User-agent: *\nDisallow: /tmp\n"
         "Sitemap: https://a.example/sitemap.xml\n"
         "sitemap:https://a.example/news.xml\r\n"
         "SITEMAP:   https://a.example/sitemap.xml  \n"  # dup collapses
         "Sitemap: /relative.xml\n"  # relative → ignored
         "# Sitemap: https://a.example/commented.xml"),  # comment line
        ("b.example", "User-agent: *\nAllow: /"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROBOTS, "domain string, robots_txt string"
        )

    def test_extraction(self, spark):
        from augmented_codebase_indexer_spark.operators.robots import (
            robots_sitemaps,
        )

        got = sorted(
            tuple(r) for r in robots_sitemaps(self._df(spark)).collect()
        )
        assert got == [
            ("a.example", "https://a.example/news.xml"),
            ("a.example", "https://a.example/sitemap.xml"),
        ]

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from augmented_codebase_indexer_spark.operators.robots import (
            robots_sitemaps,
            robots_sitemaps_oracle_sql,
        )

        robots_sql = " UNION ALL ".join(
            "SELECT '{}' AS domain, '{}' AS robots_txt".format(
                d, t.replace("\r", "' || chr(13) || '")
                    .replace("\n", "' || chr(10) || '")
            )
            for d, t in self.ROBOTS
        )
        con = duckdb.connect()
        want = sorted(tuple(r) for r in con.execute(
            robots_sitemaps_oracle_sql(robots_sql)).fetchall())
        got = sorted(
            tuple(r) for r in robots_sitemaps(self._df(spark)).collect()
        )
        assert got == want
