"""Crawl frontier (operators/frontier.py): canonical dedup, robots
gate, per-host cap/slots, WindowGroupLimit plan, and DuckDB parity."""

from augmented_codebase_indexer_spark.operators.frontier import (
    crawl_frontier,
    crawl_frontier_oracle_sql,
)
from augmented_codebase_indexer_spark.operators.robots import parse_robots

CANDS = [
    "https://a.example.com/p/1",
    "https://A.EXAMPLE.COM:443/p/1?utm_source=feed",   # same canonical
    "https://a.example.com/p/2",
    "https://a.example.com/secret/x",                  # robots-disallowed
    "https://b.example.com/p/9",
    "https://b.example.com/p/8",
    "https://b.example.com/p/7",
]
ROBOTS = [("a.example.com", "User-agent: *\nDisallow: /secret/\n")]


def _frontier(spark, **kw):
    cands = spark.createDataFrame([(u,) for u in CANDS], "url string")
    rules = parse_robots(
        spark.createDataFrame(ROBOTS, "domain string, robots_txt string")
    )
    return crawl_frontier(cands, rules, agent="aci-bot", **kw)


def test_dedup_gate_and_slots(spark):
    got = {(r["url"], r["host"], r["slot"]) for r in _frontier(spark).collect()}
    assert got == {
        ("https://a.example.com/p/1", "a.example.com", 1),
        ("https://a.example.com/p/2", "a.example.com", 2),
        ("https://b.example.com/p/7", "b.example.com", 1),
        ("https://b.example.com/p/8", "b.example.com", 2),
        ("https://b.example.com/p/9", "b.example.com", 3),
    }


def test_per_host_cap_bounds_slots(spark):
    got = _frontier(spark, per_host_cap=2)
    rows = {(r["host"], r["slot"]) for r in got.collect()}
    assert rows == {
        ("a.example.com", 1), ("a.example.com", 2),
        ("b.example.com", 1), ("b.example.com", 2),
    }
    # the cap plans as WindowGroupLimit — per-host state is O(cap)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_duckdb_parity(spark):
    import duckdb

    cands_sql = " UNION ALL ".join(f"SELECT '{u}' AS url" for u in CANDS)
    robots_sql = " UNION ALL ".join(
        f"SELECT '{d}' AS domain, '{t.replace(chr(10), chr(92) + 'n')}' "
        "AS robots_txt" for d, t in ROBOTS
    )
    # duckdb literal '\n' needs e-string: build via parameter instead
    con = duckdb.connect()
    con.execute("CREATE TABLE r(domain VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO r VALUES (?, ?)", ROBOTS)
    for cap in (None, 2):
        got = sorted(map(tuple, _frontier(spark, per_host_cap=cap).collect()))
        want = sorted(
            map(
                tuple,
                con.execute(
                    crawl_frontier_oracle_sql(
                        cands_sql, "SELECT * FROM r", "aci-bot", per_host_cap=cap
                    )
                ).fetchall(),
            )
        )
        assert got == want, cap
