"""Politeness fetch scheduling (operators/schedule.py): Crawl-delay
parsing (precedence, decimals, junk), schedule arithmetic, drain
report, DuckDB parity."""

import duckdb

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.schedule import (
    fetch_schedule,
    fetch_schedule_oracle_sql,
    host_drain,
    host_drain_oracle_sql,
    parse_crawl_delays,
    parse_crawl_delays_oracle_sql,
)

ROBOTS = [
    # star-only integer delay
    ("a.example", "User-agent: *\nCrawl-delay: 2\nDisallow: /x"),
    # exact group overrides star (star says 0.5s, bot group says 3)
    ("b.example",
     "User-agent: *\nCrawl-delay: 0.5\n\n"
     "User-agent: aci-bot\nCrawl-delay: 3"),
    # decimal star delay
    ("c.example", "User-agent: *\nCrawl-delay: 1.25"),
    # junk value -> absent (caller default)
    ("d.example", "User-agent: *\nCrawl-delay: fast"),
    # no delay directive at all
    ("e.example", "User-agent: *\nDisallow: /private"),
    # exact group EXISTS but its delay is junk while * is good: the
    # exact group governs only rows that parsed — has_exact is over
    # PARSEABLE delays, so * applies here
    ("f.example",
     "User-agent: aci-bot\nCrawl-delay: soon\n"
     "User-agent: *\nCrawl-delay: 4"),
]

QUEUE = [
    ("https://a.example/1", "a.example", 1),
    ("https://a.example/2", "a.example", 2),
    ("https://a.example/3", "a.example", 3),
    ("https://b.example/1", "b.example", 1),
    ("https://b.example/2", "b.example", 2),
    ("https://d.example/1", "d.example", 1),
    ("https://d.example/2", "d.example", 2),
]


def _robots_df(spark):
    return spark.createDataFrame(ROBOTS, "domain string, robots_txt string")


def _queue_df(spark):
    return spark.createDataFrame(QUEUE, "url string, host string, slot long")


def _robots_sql():
    return " UNION ALL ".join(
        f"SELECT '{d}' AS domain, '{t}' AS robots_txt".replace("\n", "' || chr(10) || '")
        for d, t in ROBOTS)


def _queue_sql():
    return " UNION ALL ".join(
        f"SELECT '{u}' AS url, '{h}' AS host, CAST({s} AS BIGINT) AS slot"
        for u, h, s in QUEUE)


def test_parse_crawl_delays(spark):
    got = {r["domain"]: r["delay_ms"]
           for r in parse_crawl_delays(_robots_df(spark)).collect()}
    assert got == {
        "a.example": 2000,   # integer seconds -> ms
        "b.example": 3000,   # exact group wins over star's 500
        "c.example": 1250,   # decimal assembled in integer ms
        "f.example": 4000,   # junk exact delay -> star governs
    }  # d (junk), e (absent) have no row


def test_schedule_and_drain(spark):
    sched = fetch_schedule(
        _queue_df(spark), parse_crawl_delays(_robots_df(spark)),
        start_epoch_ms=1000, default_delay_ms=700,
    )
    rows = {(r["host"], r["slot"]): r for r in sched.collect()}
    assert rows[("a.example", 3)]["fetch_epoch_ms"] == 1000 + 2 * 2000
    assert rows[("b.example", 2)]["fetch_epoch_ms"] == 1000 + 3000
    assert rows[("d.example", 2)]["delay_ms"] == 700  # default
    drain = {r["host"]: r for r in host_drain(sched, window_ms=4000).collect()}
    a = drain["a.example"]
    assert a["n_urls"] == 3 and a["drain_ms"] == 4000
    assert a["overflow_urls"] == 1 and a["fits_window"] is False
    assert drain["d.example"]["fits_window"] is True


def test_matches_duckdb_oracle(spark):
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        parse_crawl_delays_oracle_sql(_robots_sql())).fetchall())
    got = sorted(tuple(r) for r in
                 parse_crawl_delays(_robots_df(spark)).collect())
    assert got == want and len(got) == 4

    sched_sql = fetch_schedule_oracle_sql(
        _queue_sql(), _robots_sql(), start_epoch_ms=1000,
        default_delay_ms=700)
    want = sorted(tuple(r) for r in con.execute(sched_sql).fetchall())
    sched = fetch_schedule(
        _queue_df(spark), parse_crawl_delays(_robots_df(spark)),
        start_epoch_ms=1000, default_delay_ms=700)
    got = sorted(tuple(r) for r in sched.collect())
    assert got == want and len(got) == len(QUEUE)

    want = sorted(tuple(r) for r in con.execute(
        host_drain_oracle_sql(sched_sql, window_ms=4000)).fetchall())
    got = sorted(tuple(r) for r in
                 host_drain(sched, window_ms=4000).collect())
    assert got == want
