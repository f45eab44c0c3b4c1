"""CDXJ capture selection (operators/cdx.py): parse/drop, latest-OK
per url, digest dedup, and Spark↔DuckDB parity on planted index lines."""

import json

import duckdb
import pyspark.sql.functions as F  # noqa: F401

from augmented_codebase_indexer_spark.operators.cdx import (
    dedup_by_digest,
    latest_ok_captures,
    latest_ok_sql,
    parse_cdxj,
)


def _line(surt, ts, **j):
    base = dict(url=f"http://{surt.split(')')[0][::-1]}/", status="200",
                mime="text/html", digest="D0", filename="w0.warc.gz",
                offset="0", length="10")
    base.update({k: str(v) for k, v in j.items()})
    return f"{surt} {ts} {json.dumps(base, sort_keys=True)}"


LINES = [
    _line("com,ex)/a", 20240101000000, url="http://ex.com/a", digest="DA",
          offset=0, length=5),
    _line("com,ex)/a", 20240301000000, url="http://ex.com/a", digest="DB",
          offset=5, length=7),           # newer -> wins for /a
    _line("com,ex)/a", 20240401000000, url="http://ex.com/a", digest="DC",
          status="404", offset=12, length=3),  # newest but 404 -> ignored
    _line("com,ex)/b", 20240201000000, url="http://ex.com/b", digest="DB",
          offset=20, length=7),          # same payload as /a's winner
    _line("com,ex)/c", 20240115000000, url="http://ex.com/c", digest="DD",
          offset=30, length=9),
    "garbage line without json",
    "com,ex)/d notanumber {\"url\":\"http://ex.com/d\"}",
]


def _cdx(spark):
    return parse_cdxj(
        spark.createDataFrame([(l,) for l in LINES], "line string"))


def test_parse_drops_malformed_keeps_valid(spark):
    rows = _cdx(spark).collect()
    assert len(rows) == 5
    r = {(x["url"], x["ts"]): x for x in rows}
    a = r[("http://ex.com/a", 20240301000000)]
    assert (a["digest"], a["offset"], a["length"]) == ("DB", 5, 7)
    assert a["status"] == "200" and a["mime"] == "text/html"


def test_latest_ok_per_url(spark):
    sel = {r["url"]: r for r in latest_ok_captures(_cdx(spark)).collect()}
    assert set(sel) == {"http://ex.com/a", "http://ex.com/b", "http://ex.com/c"}
    # /a: the 404 newest capture is skipped, the 2024-03 one wins
    assert sel["http://ex.com/a"]["ts"] == 20240301000000
    assert sel["http://ex.com/a"]["digest"] == "DB"


def test_dedup_by_digest_one_fetch_per_payload(spark):
    sel = latest_ok_captures(_cdx(spark))
    ded = {r["digest"]: r for r in dedup_by_digest(sel).collect()}
    assert set(ded) == {"DB", "DD"}
    # min (url, ts) wins the shared digest: /a sorts before /b
    assert ded["DB"]["url"] == "http://ex.com/a"


def test_latest_ok_oracle_parity(spark):
    got = sorted(map(tuple, latest_ok_captures(_cdx(spark)).collect()))
    con = duckdb.connect()
    lines_sql = " UNION ALL ".join(
        "SELECT '" + l.replace("'", "''") + "' AS line" for l in LINES)
    want = sorted(map(tuple, con.execute(latest_ok_sql(lines_sql)).fetchall()))
    assert got == want
