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


def test_upsert_index_prunes_discovery(spark, tmp_path_factory):
    """The (delete_col, bucket) index sidecar exists after the first upsert
    and later upserts stay correct while discovery reads it (superset
    semantics: deleted keys may linger, missed keys may not)."""
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_idx")), "i0")
    base = spark.range(0, 1000).select(
        F.concat(F.lit("u"), (F.col("id") % 50).cast("string")).alias("url"),
        F.col("id").alias("subj_id"), (F.col("id") % 5).alias("v"),
    )
    wh.commit(base, "edges", bucket_col="subj_id", n_buckets=8)
    idx_path = wh.path("edges") + ".__idx__"
    assert not os.path.isdir(idx_path)

    def upsert(url, lo):
        keys = spark.createDataFrame([(url,)], "url string")
        rows = spark.createDataFrame(
            [(url, lo + i, 9) for i in range(3)], "url string, subj_id long, v long")
        wh.upsert_buckets(spark, "edges", rows, keys, delete_col="url",
                          bucket_col="subj_id", n_buckets=8)
        return rows

    r1 = upsert("u3", 10_000)
    assert os.path.isdir(idx_path)  # seeded by the first upsert's scan
    # index holds every live key (superset check)
    live = {r["url"] for r in wh.read(spark, "edges").select("url").distinct().collect()}
    idx_keys = {r["url"] for r in spark.read.parquet(idx_path).collect()}
    assert live <= idx_keys
    r2 = upsert("u3", 20_000)  # second upsert: discovery via the index
    got = {tuple(r) for r in wh.read(spark, "edges").drop("bucket").collect()}
    want = {tuple(r) for r in
            base.filter(F.col("url") != "u3").unionByName(r2).collect()}
    assert got == want
    # a full-rewrite commit invalidates (drops) the index
    wh.commit(base, "edges", bucket_col="subj_id", n_buckets=8)
    assert not os.path.isdir(idx_path)


def test_upsert_crash_recovery_completes_swap(spark, tmp_path_factory):
    """A crash mid-swap (manifest present, some buckets swapped) must roll
    FORWARD on the next read: the table equals the completed upsert."""
    import json as _json
    import shutil as _shutil

    root = str(tmp_path_factory.mktemp("wh_crash"))
    wh = Warehouse(root, "c0")
    v1 = spark.range(0, 800).select(
        F.col("id").alias("subj_id"), F.lit("old").alias("tag"))
    v2 = spark.range(0, 800).select(
        F.col("id").alias("subj_id"), F.lit("new").alias("tag"))
    wh.commit(v1, "edges", bucket_col="subj_id", n_buckets=4)
    # stage the would-be upsert output as the tmp dir (all 4 buckets new)
    wh2 = Warehouse(root, "c0-stage")
    wh2.commit(v2, "staged", bucket_col="subj_id", n_buckets=4)
    final = wh.path("edges")
    tmp = final + ".__tmp_upsert_c0__"
    os.rename(wh.path("staged"), tmp)
    # simulate the crash: manifest written, only bucket 0 swapped
    with open(final + ".__upsert_manifest__.json", "w") as f:
        _json.dump({"tmp": tmp, "swap": [0, 1, 2, 3], "empty": []}, f)
    Warehouse._swap_bucket(final, tmp, 0)
    # also leave bucket 1 in the worst intermediate state: dst moved to bak
    os.rename(os.path.join(final, "bucket=1"),
              os.path.join(final, "bucket=1.__old__"))

    # next read triggers forward recovery
    got = wh.read(spark, "edges")
    assert {r["tag"] for r in got.select("tag").distinct().collect()} == {"new"}
    assert got.count() == 800
    assert not os.path.isfile(final + ".__upsert_manifest__.json")
    assert not os.path.isdir(tmp)
    assert not os.path.isdir(os.path.join(final, "bucket=1.__old__"))


def test_upsert_delete_all_keeps_table_readable(spark, tmp_path_factory):
    """Deleting every row must leave a readable zero-row table, not a
    schema-less directory of empty bucket dirs."""
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_empty")), "e0")
    base = spark.createDataFrame(
        [("u1", 1, 1), ("u2", 2, 2)], "url string, subj_id long, v long")
    wh.commit(base, "edges", bucket_col="subj_id", n_buckets=4)
    keys = spark.createDataFrame([("u1",), ("u2",)], "url string")
    empty = spark.createDataFrame([], "url string, subj_id long, v long")
    wh.upsert_buckets(spark, "edges", empty, keys, delete_col="url",
                      bucket_col="subj_id", n_buckets=4)
    df = wh.read(spark, "edges")
    assert df.count() == 0
    assert set(df.columns) >= {"url", "subj_id", "v"}


def test_compact_splits_oversized_bucket(spark, tmp_path_factory):
    """A bucket far above target_file_mb must come out of compaction as
    multiple files, not one huge file."""
    wh = Warehouse(str(tmp_path_factory.mktemp("wh_split")), "s0")
    # all rows share one subj_id -> a single hot bucket; pad makes it ~4 MB
    df = spark.range(0, 40_000).select(
        F.lit("hot").alias("subj_id"), F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 512).alias("pad"),
    )
    wh.commit(df, "edges", bucket_col="subj_id", n_buckets=4)
    # fragment it so compaction is not a no-op
    extra = df.limit(500).withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("subj_id")), F.lit(4)))
    for _ in range(3):
        extra.write.mode("append").partitionBy("bucket").parquet(wh.path("edges"))
    before = {tuple(r) for r in wh.read(spark, "edges").collect()}
    res = wh.compact(spark, "edges", target_file_mb=1)
    assert res["compacted"]
    hot_dir = [d for d in os.listdir(wh.path("edges")) if d.startswith("bucket=")]
    per_bucket = {
        d: len([f for f in os.listdir(os.path.join(wh.path("edges"), d))
                if f.endswith(".parquet")])
        for d in hot_dir
    }
    assert max(per_bucket.values()) > 1  # the hot bucket was split
    assert {tuple(r) for r in wh.read(spark, "edges").collect()} == before
