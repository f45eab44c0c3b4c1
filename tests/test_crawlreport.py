"""Host crawl report (operators/crawlreport.py): full-outer NULL
semantics and the triage flag truth table."""

from augmented_codebase_indexer_spark.operators.crawlreport import (
    host_crawl_report,
    host_crawl_report_oracle_sql,
)

import duckdb


def _frames(spark):
    profile = spark.createDataFrame(
        [("h0", 50, 50_000_000, True), ("h1", 40, 1_000_000, False)],
        "host string, n_urls long, alias_micro long, trap_flag boolean")
    drain = spark.createDataFrame(
        [("h1", 40, 1000, 39_000, 0, True),
         ("h2", 80, 5000, 395_000, 41, False)],
        "host string, n_urls long, delay_ms long, drain_ms long,"
        " overflow_urls long, fits_window boolean")
    alloc = spark.createDataFrame(
        [("h1", 40, 10), ("h2", 80, 0), ("h3", 5, 2)],
        "host string, n_pages long, alloc long")
    return profile, drain, alloc


def test_flags_and_null_semantics(spark):
    rows = {r["host"]: r for r in
            host_crawl_report(*_frames(spark)).collect()}
    assert set(rows) == {"h0", "h1", "h2", "h3"}
    assert rows["h0"]["needs_attention"] is True        # trap
    assert rows["h1"]["needs_attention"] is False       # healthy
    assert rows["h2"]["needs_attention"] is True        # overflow + alloc 0
    assert rows["h3"]["needs_attention"] is False       # alloc > 0, no data
    # absent screens stay NULL — never a fabricated healthy default
    assert rows["h0"]["queued_urls"] is None
    assert rows["h3"]["trap_flag"] is None


def test_matches_duckdb_oracle(spark):
    p, d, a = _frames(spark)

    def u(df):
        cols = df.columns
        return " UNION ALL ".join(
            "SELECT " + ", ".join(
                (f"'{v}'" if isinstance(v, str) else
                 ("true" if v is True else "false" if v is False
                  else f"CAST({v} AS BIGINT)")) + f" AS {c}"
                for v, c in zip(row, cols))
            for row in [tuple(r) for r in df.collect()])

    want = sorted(tuple(r) for r in duckdb.connect().execute(
        host_crawl_report_oracle_sql(u(p), u(d), u(a))).fetchall())
    got = sorted(tuple(r)
                 for r in host_crawl_report(p, d, a).collect())
    assert got == want and len(got) == 4
