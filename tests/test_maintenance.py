"""Warehouse table maintenance: compaction + checkpoint retention."""

import os

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.sources.catalog import Warehouse


def _files(path):
    return [os.path.join(dp, f) for dp, _, fs in os.walk(path)
            for f in fs if f.endswith(".parquet")]


def test_compaction_preserves_rows_and_shrinks_files(spark, tmp_path_factory):
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_compact")), "c0")
    df = spark.range(0, 8000).select(
        F.col("id").alias("subj_id"), (F.col("id") % 7).alias("v")
    )
    wh.commit(df, "edges", bucket_col="subj_id", n_buckets=4)
    # simulate streaming fragmentation: per-micro-batch appends leave many
    # small files inside each bucket directory
    for lo in range(8000, 12000, 500):
        batch = spark.range(lo, lo + 500).select(
            F.col("id").alias("subj_id"), (F.col("id") % 7).alias("v")
        ).withColumn("bucket", F.pmod(F.xxhash64(F.col("subj_id")), F.lit(4)))
        batch.write.mode("append").partitionBy("bucket").parquet(wh.path("edges"))
    before_rows = {tuple(r) for r in wh.read(spark, "edges").collect()}
    n_before = len(_files(wh.path("edges")))
    assert n_before > 8  # fragmented

    res = wh.compact(spark, "edges")
    assert res["compacted"] and res["files_after"] < res["files_before"]
    after = wh.read(spark, "edges")
    assert {tuple(r) for r in after.collect()} == before_rows
    # bucket layout (partition pruning) survives compaction
    assert "bucket" in after.columns
    assert any("bucket=" in p for p in _files(wh.path("edges")))

    # second compaction is a no-op (already compact)
    res2 = wh.compact(spark, "edges")
    assert not res2["compacted"]


def test_compaction_unbucketed_table(spark, tmp_path_factory):
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_compact2")), "c1")
    df = spark.range(0, 5000).select(F.col("id"), (F.col("id") * 2).alias("x"))
    wh.commit(df.repartition(32), "t")
    n = wh.read(spark, "t").count()
    res = wh.compact(spark, "t")
    assert res["compacted"] and res["files_after"] < res["files_before"]
    assert wh.read(spark, "t").count() == n


def test_upsert_buckets_equals_full_rewrite(spark, tmp_path_factory):
    """Bucket-level MERGE (delete-by-key + insert, affected buckets only)
    must equal the full-table delete+union rewrite, and must not touch
    unaffected bucket directories."""
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_upsert")), "u0")
    base = spark.range(0, 2000).select(
        F.concat(F.lit("u"), (F.col("id") % 97).cast("string")).alias("url"),
        F.col("id").alias("subj_id"),
        (F.col("id") % 5).alias("v"),
    )
    wh.commit(base, "edges", bucket_col="subj_id", n_buckets=8)
    # record per-bucket file mtimes before
    import os as _os
    pre = {}
    for b in range(8):
        d = _os.path.join(wh.path("edges"), f"bucket={b}")
        pre[b] = sorted((_os.path.getmtime(_os.path.join(d, f)), f)
                        for f in _os.listdir(d) if f.endswith(".parquet"))

    # upsert: replace url u3's rows with 5 new edges on 2 subjects
    touched = spark.createDataFrame([("u3",)], "url string")
    new_rows = spark.createDataFrame(
        [("u3", 10_000 + i, 9) for i in range(5)], "url string, subj_id long, v long"
    )
    stats = wh.upsert_buckets(spark, "edges", new_rows, touched,
                              delete_col="url", bucket_col="subj_id", n_buckets=8)
    assert 0 < stats["buckets_rewritten"] <= 8

    got = {tuple(r) for r in wh.read(spark, "edges").drop("bucket").collect()}
    want = {
        tuple(r)
        for r in base.filter(F.col("url") != "u3").unionByName(new_rows).collect()
    }
    assert got == want
    # unaffected buckets were not rewritten (same files, same mtimes)
    rewritten = stats["buckets_rewritten"]
    untouched_same = 0
    for b in range(8):
        d = _os.path.join(wh.path("edges"), f"bucket={b}")
        cur = sorted((_os.path.getmtime(_os.path.join(d, f)), f)
                     for f in _os.listdir(d) if f.endswith(".parquet"))
        if cur == pre[b]:
            untouched_same += 1
    assert untouched_same == 8 - rewritten


def test_checkpoint_retention(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wh_retain"))
    for run in ("r1", "r2", "r3"):
        wh = Warehouse(root, run)
        wh.commit_checkpoint(f"stage-{run}", None, {})
    wh = Warehouse(root, "r3")
    assert wh.expire_checkpoints({"r2", "r3"}) == 1
    # surviving runs still resume; expired run does not
    assert Warehouse(root, "r2").stage_committed("stage-r2")
    assert Warehouse(root, "r3").stage_committed("stage-r3")
    assert not Warehouse(root, "r1").stage_committed("stage-r1")
    # idempotent
    assert wh.expire_checkpoints({"r2", "r3"}) == 0
