"""Crawl-trap detection (operators/traps.py): hand aliasing ratios,
refetch collapse, trap-flag gates, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.traps import (
    url_alias_profile,
    url_alias_profile_oracle_sql,
)

MICRO = 1_000_000

FETCHES = (
    # trap.example: 8 urls, all serving the SAME content
    [(f"https://trap.example/cal?d={i}", "hash-cal") for i in range(8)]
    # ok.example: 6 urls, 6 distinct contents
    + [(f"https://ok.example/p{i}", f"hash-ok{i}") for i in range(6)]
    # mirror.example: 6 urls, every content served under exactly 2 urls
    + [(f"https://mirror.example/{v}{i}", f"hash-m{i}")
       for i in range(3) for v in ("a", "b")]
    # refetch.example: one url seen under TWO hashes (content changed)
    # counts as ONE url mapped to its min hash
    + [("https://refetch.example/x", "hash-z"),
       ("https://refetch.example/x", "hash-a")]
)


def _df(spark):
    return spark.createDataFrame(FETCHES, "url string, content_hash string")


def test_alias_profile(spark):
    prof = {r["host"]: r for r in url_alias_profile(
        _df(spark), trap_alias_micro=4 * MICRO, min_urls=5).collect()}
    t = prof["trap.example"]
    assert t["n_urls"] == 8 and t["n_hashes"] == 1
    assert t["max_urls_per_hash"] == 8
    assert t["alias_micro"] == 8 * MICRO and t["trap_flag"] is True
    ok = prof["ok.example"]
    assert ok["alias_micro"] == MICRO and ok["trap_flag"] is False
    m = prof["mirror.example"]
    assert m["alias_micro"] == 2 * MICRO and m["max_urls_per_hash"] == 2
    assert m["trap_flag"] is False
    r = prof["refetch.example"]
    assert r["n_urls"] == 1 and r["n_hashes"] == 1


def test_min_urls_gate(spark):
    # the trap host clears the ratio but not the floor when min_urls=10
    prof = {r["host"]: r for r in url_alias_profile(
        _df(spark), trap_alias_micro=4 * MICRO, min_urls=10).collect()}
    assert prof["trap.example"]["trap_flag"] is False


def test_matches_duckdb_oracle(spark):
    f_sql = " UNION ALL ".join(
        f"SELECT '{u}' AS url, '{h}' AS content_hash" for u, h in FETCHES)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        url_alias_profile_oracle_sql(
            f_sql, trap_alias_micro=4 * MICRO, min_urls=5)).fetchall())
    got = sorted(tuple(r) for r in url_alias_profile(
        _df(spark), trap_alias_micro=4 * MICRO, min_urls=5).collect())
    assert got == want and len(got) == 4
