"""WARC source reader: Common-Crawl-shaped ingestion into the pages table."""

import datetime as dt
import gzip

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc,
)

PAGES = [
    {"url": "https://a.example/p1", "warc_ts": "2026-01-01T00:00:00Z",
     "html": b"<html><body><p>Entity0 acquired Entity1.</p></body></html>"},
    {"url": "https://a.example/p2", "warc_ts": "2026-01-01T00:00:01Z",
     "html": b"<html><body><p>plain filler text.</p></body></html>"},
]


def test_warc_roundtrip_gzip_and_plain(spark, tmp_path):
    for gz in (True, False):
        name = "tgz.warc.gz" if gz else "tplain.warc"
        p = str(tmp_path / name)
        write_warc(PAGES, p, gzip_members=gz)
        df = read_warc(spark, p)
        rows = {r["url"]: r for r in df.collect()}
        assert set(rows) == {x["url"] for x in PAGES}
        assert bytes(rows["https://a.example/p1"]["html"]) == PAGES[0]["html"]
        assert rows["https://a.example/p1"]["warc_ts"] == dt.datetime(2026, 1, 1)
        assert all(r["lang"] == "unknown" for r in rows.values())


def test_warc_skips_non_response_and_truncated_tail():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n")
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: https://a.example/p1\r\nContent-Length: 2\r\n\r\nxy\r\n\r\n")
    http = b"HTTP/1.1 200 OK\r\n\r\n<html>ok</html>"
    resp = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://a.example/ok\r\n"
            b"WARC-Date: 2026-02-02T00:00:00Z\r\n"
            + f"Content-Length: {len(http)}\r\n".encode() + b"\r\n" + http + b"\r\n\r\n")
    truncated = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                 b"WARC-Target-URI: https://a.example/cut\r\n"
                 b"Content-Length: 99999\r\n\r\nonly a little")
    recs, skipped = parse_warc_bytes(info + req + resp + truncated)
    assert [r["url"] for r in recs] == ["https://a.example/ok"]
    assert recs[0]["html"] == b"<html>ok</html>"
    assert skipped == 1  # the truncated tail; info/req are type-skips
    # truncated gzip tail: parsed members survive
    data = gzip.compress(resp) + gzip.compress(resp)[:20]
    recs2, _ = parse_warc_bytes(data)
    assert [r["url"] for r in recs2] == ["https://a.example/ok"]


def test_warc_malformed_header_resyncs(spark, tmp_path):
    """ADVICE r3: a malformed Content-Length must not drop the REST of the
    file — the parser resyncs at the next WARC/ marker and counts the
    skip."""
    from augmented_codebase_indexer_spark.sources.warc import warc_skip_counts

    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://a.example/bad\r\n"
           b"Content-Length: NOT-A-NUMBER\r\n\r\ngarbage bytes here")
    http = b"HTTP/1.1 200 OK\r\n\r\n<html>later</html>"
    good = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://a.example/later\r\n"
            b"WARC-Date: 2026-02-02T00:00:00Z\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n" + http + b"\r\n\r\n")
    recs, skipped = parse_warc_bytes(bad + b"\r\n\r\n" + good)
    assert [r["url"] for r in recs] == ["https://a.example/later"]
    assert skipped == 1
    p = str(tmp_path / "resync.warc")
    with open(p, "wb") as f:
        f.write(bad + b"\r\n\r\n" + good)
    stats = warc_skip_counts(spark, p).collect()
    assert len(stats) == 1
    assert stats[0]["n_pages"] == 1 and stats[0]["n_skipped"] == 1


def test_warc_negative_length_cannot_loop(spark):
    """A NEGATIVE Content-Length parses as an int but would rewind the
    cursor to this record's own marker — the parser must treat it as
    malformed (skip + resync), not loop forever re-finding the record."""
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://a.example/neg\r\n"
           b"Content-Length: -200\r\n\r\npayload")
    http = b"HTTP/1.1 200 OK\r\n\r\n<html>after</html>"
    good = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://a.example/after\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n" + http + b"\r\n\r\n")
    recs, skipped = parse_warc_bytes(bad + b"\r\n\r\n" + good)
    assert [r["url"] for r in recs] == ["https://a.example/after"]
    assert skipped == 1


def test_warc_feeds_the_kg_pipeline(spark, tmp_path):
    """End-to-end: WARC file → pages table → extraction/OpenIE stages."""
    from augmented_codebase_indexer_spark.operators.extraction import (
        broadcast_aliases,
        extract_stage,
        triple_stage,
    )

    p = str(tmp_path / "feed.warc.gz")
    write_warc(PAGES, p)
    pages = read_warc(spark, p).withColumn("lang", F.lit("en"))
    alias_bc = broadcast_aliases(spark, ["Entity0", "Entity1"])
    triples = triple_stage(
        extract_stage(pages).filter(F.length("extracted_text") > 0), alias_bc
    ).collect()
    assert [(t["subj_surface"], t["pred"], t["obj_surface"]) for t in triples] == [
        ("Entity0", "acquired", "Entity1")
    ]
