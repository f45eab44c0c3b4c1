"""CDXJ capture-index operators — selecting WHICH web captures to fetch
before any WARC byte is read (the Common Crawl / web-archive workflow:
the CDXJ index is thousands of times smaller than the WARCs it points
into, so capture selection runs on the index and the fetch layer
receives exact (filename, offset, length) triples — the index-before-
data discipline the reference applies with its own key-index sidecar,
``sources/catalog.py``; CDXJ itself is the public pywb/OpenWayback
format: ``SURT timestamp {JSON}`` per line).

* :func:`parse_cdxj` — raw lines → typed columns. The JSON tail is cut
  by string arithmetic (the tail itself contains spaces, so a plain
  split would truncate it) and read with each engine's JSON getter;
  malformed lines (missing fields, non-numeric timestamp) are DROPPED
  here — callers needing quarantine counts diff against the raw count
  (the WARC/JSONL sources own the two-pass quarantine pattern; an index
  is regenerable, so dropping is the honest default).
* :func:`latest_ok_captures` — THE standard selection: per url, the
  newest capture among allowed statuses. groupBy + max over a sort-key
  struct (ts, digest, filename, offset) — partial-aggregated map-side,
  ONE combined row per url over the exchange, never a sorted per-url
  window (the robots-verdict shape).
* :func:`dedup_by_digest` — cross-url content dedup on the index: one
  fetch per distinct payload digest (min (url, ts) wins — stable), so
  mirrored/duplicated pages cost one WARC read instead of N.

Scale shape at 10^11 index lines: parsing is a narrow projection;
each selection is exactly one map-side-combined exchange keyed by url
(or digest) carrying one slim combined row per key. No text beyond the
url/digest strings ever shuffles; no UDF; every gated column is
string/BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FIELDS = ("url", "status", "mime", "digest", "filename")
_INT_FIELDS = ("offset", "length")


def parse_cdxj(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """(line) → (surt, ts BIGINT, url, status, mime, digest, filename,
    offset BIGINT, length BIGINT); malformed lines dropped (see module
    docstring)."""
    ln = F.col(line_col)
    surt = F.split_part(ln, F.lit(" "), F.lit(1))
    ts = F.split_part(ln, F.lit(" "), F.lit(2))
    jtail = ln.substr(
        F.length(surt) + F.length(ts) + F.lit(3), F.length(ln)
    )
    # try_cast, not cast: ANSI mode (Spark 4 default) makes a plain cast
    # THROW on the malformed lines this parser exists to drop
    out = lines.select(
        surt.alias("surt"),
        ts.try_cast("long").alias("ts"),
        *[F.get_json_object(jtail, f"$.{f}").alias(f) for f in _FIELDS],
        *[F.get_json_object(jtail, f"$.{f}").try_cast("long").alias(f)
          for f in _INT_FIELDS],
    )
    return out.filter(
        (F.col("surt") != "")
        & F.col("ts").isNotNull()
        & F.col("url").isNotNull()
        & F.col("digest").isNotNull()
        & F.col("filename").isNotNull()
        & F.col("offset").isNotNull()
        & F.col("length").isNotNull()
    )


def latest_ok_captures(
    cdx: DataFrame, statuses: tuple = ("200",)
) -> DataFrame:
    """Newest allowed-status capture per url:
    (url, ts, digest, filename, offset, length)."""
    pick = F.struct("ts", "digest", "filename", "offset", "length")
    return (
        cdx.filter(F.col("status").isin(*statuses))
        .groupBy("url")
        .agg(F.max(pick).alias("b"))
        .select("url", "b.ts", "b.digest", "b.filename", "b.offset",
                "b.length")
    )


def dedup_by_digest(selected: DataFrame) -> DataFrame:
    """One fetch per distinct payload digest: min (url, ts, …) wins —
    input shape is :func:`latest_ok_captures` output."""
    pick = F.struct("url", "ts", "filename", "offset", "length")
    return (
        selected.groupBy("digest")
        .agg(F.min(pick).alias("b"))
        .select("digest", "b.url", "b.ts", "b.filename", "b.offset",
                "b.length")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors
# ---------------------------------------------------------------------------

def parse_cdxj_sql(lines_sql: str) -> str:
    """CTE text mirroring :func:`parse_cdxj` over a (line) relation."""
    fields = ",\n             ".join(
        f"json_extract_string(jtail, '$.{f}') AS {f}" for f in _FIELDS
    )
    ints = ",\n             ".join(
        f"CAST(json_extract_string(jtail, '$.{f}') AS BIGINT) AS {f}"
        for f in _INT_FIELDS
    )
    return f"""
    raw AS ({lines_sql}),
    cut AS (
      SELECT line,
             split_part(line, ' ', 1) AS surt,
             split_part(line, ' ', 2) AS tstr,
             substring(line, length(split_part(line, ' ', 1))
                             + length(split_part(line, ' ', 2)) + 3) AS jtail
      FROM raw),
    parsed AS (
      SELECT surt, TRY_CAST(tstr AS BIGINT) AS ts,
             {fields},
             {ints}
      FROM cut)
    , cdx AS (
      SELECT * FROM parsed
      WHERE surt <> '' AND ts IS NOT NULL AND url IS NOT NULL
        AND digest IS NOT NULL AND filename IS NOT NULL
        AND "offset" IS NOT NULL AND length IS NOT NULL)"""


def latest_ok_sql(lines_sql: str, statuses: tuple = ("200",)) -> str:
    ss = ", ".join(f"'{s}'" for s in statuses)
    return f"""
    WITH {parse_cdxj_sql(lines_sql)},
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY url
        ORDER BY ts DESC, digest DESC, filename DESC, "offset" DESC,
                 length DESC) AS rn
      FROM cdx WHERE status IN ({ss}))
    SELECT url, ts, digest, filename, "offset" AS offset, length
    FROM ranked WHERE rn = 1
    """
