"""Query-modifier parsing (F4/F5) + watermark late-data semantics."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.functions.queryparse import (
    parse_query,
    url_predicate,
)


def test_parse_query_grammar():
    p = parse_query("acme merger path:*.example/* -path:spam exclude:ads file:news")
    assert p.terms == "acme merger"
    assert p.includes == ["*.example/*", "news"]
    assert p.excludes == ["spam", "ads"]
    assert p.phrases == []


def test_parse_query_quoted_phrases():
    p = parse_query('acme "merger announcement" path:*.example/* "board vote"')
    assert p.phrases == ["merger announcement", "board vote"]
    assert p.includes == ["*.example/*"]
    # phrase tokens still rank: they are appended to the term string
    assert p.terms == "acme merger announcement board vote"
    # empty and unterminated quotes never raise
    assert parse_query('""').phrases == []
    assert parse_query('"unterminated rest').terms == '"unterminated rest'


@given(st.text(alphabet=st.characters(blacklist_characters=':-"', blacklist_categories=("Cs", "Zs")), max_size=20))
@settings(max_examples=100, deadline=None)
def test_parse_query_total(s):
    p = parse_query(s)  # never raises; terms roundtrip for modifier-free input
    assert p.terms == " ".join(s.split())


def test_url_predicate_pushdown(spark, corpus_dir):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    p = parse_query("anything path:site-0001* exclude:page-000071")
    got = {r["url"] for r in pages.filter(url_predicate(p)).select("url").collect()}
    assert got and all("site-0001" in u for u in got)
    assert not any("page-000071" in u for u in got)
    # predicate reaches the scan
    plan = pages.filter(url_predicate(p))._jdf.queryExecution().toString()
    assert "PushedFilters" in plan


def test_windowed_agg_with_watermark_drops_late_rows(spark, tmp_path):
    """Watermark semantics on a streamed windowed count: an event older than
    watermark horizon arriving in a later batch is dropped."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    schema = "event_id long, ts timestamp, value double"
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def write(rows, n=1):
        spark.createDataFrame(rows, schema=schema).repartition(n).write.mode(
            "append").parquet(src)

    def drain():
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("win_start"), "n")
        )
        q = (
            agg.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(300)

    # batch 1: events in window [00:00, 00:10) and one at 01:00 advancing the watermark
    write([(1, t0 + dt.timedelta(minutes=1), 1.0),
           (2, t0 + dt.timedelta(minutes=2), 1.0),
           (3, t0 + dt.timedelta(hours=1), 1.0)])
    drain()
    # batch 2: a very late event for the long-closed first window
    write([(4, t0 + dt.timedelta(minutes=3), 1.0),
           (5, t0 + dt.timedelta(hours=1, minutes=5), 1.0)])
    drain()
    # windows emitted after closing: first window must count ONLY the
    # on-time events (2), the late event_id=4 dropped
    rows = {r["win_start"]: r["n"] for r in spark.read.parquet(out).collect()}
    first = min(rows)
    assert rows[first] == 2
