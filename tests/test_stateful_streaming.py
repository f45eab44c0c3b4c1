"""applyInPandasWithState cross-batch dedup: re-delivered identical content
is suppressed across micro-batches; changed content passes as 'modified'."""

import time

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.streaming.stateful import dedup_pages_stateful

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _write_batch(spark, path, rows, n_files=1):
    df = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    df.repartition(n_files).write.mode("append").parquet(path)


def test_stateful_cross_batch_dedup(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    import datetime as dt

    ts = dt.datetime(2026, 1, 1)
    # batch 1: two urls
    _write_batch(spark, src, [
        ("u1", ts, bytearray(b"<p>alpha</p>"), None, "en"),
        ("u2", ts, bytearray(b"<p>beta</p>"), None, "en"),
    ])

    def run_available():
        stream = (
            spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            dedup_pages_stateful(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_available()
    # batch 2: u1 identical (suppressed), u2 changed, u3 new
    _write_batch(spark, src, [
        ("u1", ts, bytearray(b"<p>alpha</p>"), None, "en"),
        ("u2", ts, bytearray(b"<p>beta-CHANGED</p>"), None, "en"),
        ("u3", ts, bytearray(b"<p>gamma</p>"), None, "en"),
    ])
    run_available()

    rows = spark.read.parquet(out).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r["change"])
    assert by_url["u1"] == ["new"]                      # duplicate suppressed
    assert sorted(by_url["u2"]) == ["modified", "new"]  # change passed through
    assert by_url["u3"] == ["new"]
