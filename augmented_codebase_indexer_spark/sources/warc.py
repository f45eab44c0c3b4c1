"""WARC source reader — Common-Crawl-shaped ingestion for the pages table.

The pipeline's ``input_hint`` schema ``(url, warc_ts, html, text, lang)``
is exactly what a WARC response record carries; this module turns raw
WARC/1.0 or WARC/1.1 files (plain or member-gzipped, the Common Crawl
layout) into that table:

    spark.read.format("binaryFile").load("…/*.warc.gz")
        → mapInPandas(parse records)  → pages(url, warc_ts, html, text, lang)

Scale model: a ``.warc.gz`` is a concatenation of per-record gzip members
and is NOT block-splittable — the unit of parallelism is the FILE, which
is how Common Crawl is consumed in practice (the corpus ships as ~10^5
×1 GB files per crawl; one task per file saturates any cluster). Parsing
is stdlib-only (``gzip``), Arrow-batched, and emits only response
records; ``lang`` is left ``'unknown'`` for the downstream language-ID
operator (``operators/textstats.py``) to fill — identifying languages is
an operator, not an ingest side effect.

Format reference: ISO 28500 (WARC) — public specification. The reference
repo scans filesystems (``core/file_scanner/scanner.py``); WARC is the
web-corpus analog of its directory walker.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_MAX_RECORD_BYTES = 10 * 1024 * 1024  # mirrors the pipeline's 10 MB page cap


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members (the Common Crawl
    per-record layout; GzipFile walks members transparently), keeping
    whatever decompressed if the tail member is truncated. Plain data
    yields itself."""
    if not data[:2] == b"\x1f\x8b":
        yield data
        return
    import zlib

    out = io.BytesIO()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)  # one gzip member, stop at its end
        try:
            chunk = d.decompress(rest)
        except zlib.error:
            break  # corrupt member: keep what earlier members yielded
        if not d.eof:
            # truncated trailing member: its partial output is unsafe to
            # parse (records need exact Content-Length bounds) — drop it
            break
        out.write(chunk)
        rest = d.unused_data
    yield out.getvalue()


def parse_warc_bytes(data: bytes) -> tuple[list[dict], int]:
    """All response records of one WARC file →
    ([{url, warc_ts, html}], n_skipped). Headers are parsed leniently;
    ``n_skipped`` counts every record DROPPED for a reason other than its
    type (malformed Content-Length, truncated tail, oversized payload,
    missing target URI) — the JSONL reader's no-silent-drops policy
    (ADVICE r3: a malformed header used to abort the remainder of the
    file; now the parser resyncs at the next ``WARC/`` marker, and the
    type/size guards run BEFORE the payload is sliced)."""
    out: list[dict] = []
    skipped = 0
    for chunk in _split_gzip_members(data):
        pos = 0
        while True:
            head = chunk.find(b"WARC/", pos)
            if head < 0:
                break
            hdr_end = chunk.find(b"\r\n\r\n", head)
            if hdr_end < 0:
                skipped += 1  # header block never terminates
                break
            headers: dict[str, str] = {}
            for line in chunk[head:hdr_end].split(b"\r\n")[1:]:
                if b":" in line:
                    k, v = line.split(b":", 1)
                    headers[k.strip().decode("ascii", "replace").lower()] = (
                        v.strip().decode("utf-8", "replace")
                    )
            body_start = hdr_end + 4
            try:
                length = int(headers.get("content-length", ""))
                if length < 0:
                    # a negative length would REWIND pos to (or before) this
                    # record's own marker and loop forever re-finding it
                    raise ValueError("negative content-length")
            except ValueError:
                # malformed header: the payload bound is unknowable for THIS
                # record only — resync at the next record marker instead of
                # dropping the rest of the file
                skipped += 1
                nxt = chunk.find(b"WARC/", body_start)
                if nxt < 0:
                    break
                pos = nxt
                continue
            pos = body_start + length
            if body_start + length > len(chunk):
                skipped += 1  # truncated tail record
                break
            if headers.get("warc-type") != "response":
                continue  # warcinfo/request/metadata records carry no page
            if length > _MAX_RECORD_BYTES:
                skipped += 1  # the scanner's 10 MB guard — counted, not silent
                continue
            body = chunk[body_start : body_start + length]
            # payload = HTTP response; the html starts after its header block
            http_end = body.find(b"\r\n\r\n")
            html = body[http_end + 4 :] if http_end >= 0 else body
            url = headers.get("warc-target-uri")
            ts = headers.get("warc-date")  # ISO-8601 per spec
            if url:
                out.append({"url": url, "warc_ts": ts, "html": html})
            else:
                skipped += 1  # response record without a target URI
    return out, skipped


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """→ pages DataFrame in the input_hint schema. One task per WARC file
    (see module docstring for why that is the right parallelism unit).
    Per-file skip counts are a separate scan — ``warc_skip_counts`` —
    so the hot ingest path stays a single narrow stage."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                recs, _ = parse_warc_bytes(bytes(content))
                for rec in recs:
                    ts = None
                    if rec["warc_ts"]:
                        t = pd.Timestamp(rec["warc_ts"])
                        ts = t.tz_convert(None) if t.tzinfo else t
                    rows.append((rec["url"], ts, rec["html"], None, "unknown"))
            yield pd.DataFrame(rows, columns=cols)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(fn, PAGES_SCHEMA)


def warc_skip_counts(spark: SparkSession, path: str) -> DataFrame:
    """Quarantine/alerting side output: (path, n_pages, n_skipped) per WARC
    file, where ``n_skipped`` is ``parse_warc_bytes``'s dropped-record
    count — the WARC analog of the JSONL reader's corrupt side output."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                recs, skipped = parse_warc_bytes(bytes(content))
                rows.append((p, len(recs), skipped))
            yield pd.DataFrame(rows, columns=["path", "n_pages", "n_skipped"])

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(fn, "path string, n_pages long, n_skipped long")


def write_warc(pages: list[dict], path: str, gzip_members: bool = True) -> None:
    """Tiny WARC writer for tests/fixtures (response records only;
    member-gzipped by default, matching Common Crawl)."""
    blobs = []
    for p in pages:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + p["html"]
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {p['url']}\r\n".encode()
            + f"WARC-Date: {p['warc_ts']}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n" + http + b"\r\n\r\n"
        )
        blobs.append(gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as f:
        f.write(b"".join(blobs))
