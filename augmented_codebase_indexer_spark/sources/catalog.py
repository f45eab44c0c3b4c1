"""Warehouse: atomic table commits, subject-hash bucketing, checkpoints, lineage.

Production target is an Iceberg catalog (atomic snapshot commits, row-level
deletes, `bucket(N, subj_id)` partition transform, incremental scans). The
sandbox has no Iceberg runtime jar, so this module provides the same
contract over parquet directories:

 * **atomic commit** — write to ``<table>.__tmp_<run>__`` then a single
   ``os.rename`` onto the final directory (readers see old-or-new, never
   partial; Iceberg-snapshot-commit analog of the reference's pending-batch
   WAL ``metadata_store/store.py:292-342``);
 * **bucketing** — an explicit ``bucket = pmod(xxhash64(subj_id), N)``
   partition column + ``partitionBy`` so subject lookups prune directories
   (the B-tree-index analog of ``sqlite.py:86-93``); with Iceberg this is
   ``bucket(N, subj_id)`` and with writeTo().partitionedBy();
 * **checkpoints** — one JSON line per committed stage keyed by
   ``(run_id, stage)``; restart skips committed stages and reads their
   outputs (north_rule resumability; startup-check analog
   ``indexing_service.py:106-126``);
 * **lineage** — per-partition row counts + per-stage wall time and
   percentile stats (A5 analog, ``services/metrics_collector.py:95-123``).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Warehouse:
    def __init__(self, root: str, run_id: str = "run-0"):
        self.root = root
        self.run_id = run_id
        os.makedirs(root, exist_ok=True)
        self._ckpt_path = os.path.join(root, "_checkpoints.jsonl")

    # -- tables -------------------------------------------------------------

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.path(table))

    def commit(
        self,
        df: DataFrame,
        table: str,
        bucket_col: str | None = None,
        n_buckets: int = 32,
        sort_within: list[str] | None = None,
    ) -> str:
        """Atomic overwrite-commit of ``df`` as ``table``.

        With ``bucket_col``: adds ``bucket = pmod(xxhash64(col), N)``,
        repartitions by it (one shuffle that co-locates each bucket) and
        writes ``partitionBy(bucket)`` so per-subject reads prune; rows are
        sorted within partitions for locality (Iceberg sort-order analog).
        """
        final = self.path(table)
        tmp = final + f".__tmp_{self.run_id}__"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)  # leftover from a killed run — safe to discard
        writer_df = df
        if bucket_col is not None:
            writer_df = df.withColumn(
                "bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
            ).repartition("bucket")
            if sort_within:
                writer_df = writer_df.sortWithinPartitions(*sort_within)
            writer_df.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        else:
            if sort_within:
                writer_df = writer_df.sortWithinPartitions(*sort_within)
            writer_df.write.mode("overwrite").parquet(tmp)
        old = final + ".__old__"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.isdir(old):
            shutil.rmtree(old)
        return final

    def upsert_buckets(
        self,
        spark: SparkSession,
        table: str,
        new_rows: DataFrame,
        delete_keys: DataFrame,
        delete_col: str,
        bucket_col: str,
        n_buckets: int = 32,
        sort_within: list[str] | None = None,
    ) -> dict:
        """Partial upsert: delete-by-key then insert, rewriting ONLY the
        bucket partitions that contain affected rows (Iceberg MERGE INTO /
        copy-on-write analog at partition granularity).

        A micro-batch touching 0.1% of urls previously rewrote the entire
        edge table (fine in tests, quadratic-in-time at 100 TB). Here:

          1. affected buckets = buckets holding rows whose ``delete_col``
             is in ``delete_keys`` (bucket-pruned scan) ∪ buckets of the
             new rows (computed from ``bucket_col``);
          2. read ONLY those partitions, anti-join the delete keys, union
             the new rows;
          3. atomically swap just those bucket directories — untouched
             buckets are never read or written.

        Returns {"buckets_rewritten": k, "n_buckets": N}."""
        final = self.path(table)
        if not os.path.isdir(final):
            self.commit(new_rows, table, bucket_col=bucket_col,
                        n_buckets=n_buckets, sort_within=sort_within)
            return {"buckets_rewritten": n_buckets, "n_buckets": n_buckets}

        old = self.read(spark, table)
        keys = delete_keys.select(F.col(delete_col)).distinct()
        del_buckets = {
            r["bucket"]
            for r in old.join(F.broadcast(keys), delete_col)
            .select("bucket").distinct().collect()
        }
        new_b = new_rows.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
        )
        ins_buckets = {r["bucket"] for r in new_b.select("bucket").distinct().collect()}
        affected = sorted(del_buckets | ins_buckets)
        if not affected:
            return {"buckets_rewritten": 0, "n_buckets": n_buckets}

        touched_old = old.filter(F.col("bucket").isin(affected))  # partition-pruned
        merged = (
            touched_old.join(F.broadcast(keys), delete_col, "left_anti")
            .unionByName(new_b.filter(F.col("bucket").isin(affected)))
        )
        merged = merged.repartition("bucket")
        if sort_within:
            merged = merged.sortWithinPartitions(*sort_within)
        tmp = final + f".__tmp_upsert_{self.run_id}__"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        merged.write.mode("overwrite").partitionBy("bucket").parquet(tmp)

        # swap only the affected bucket directories (atomic per bucket; a
        # killed swap leaves each bucket old-or-new, never partial — with
        # Iceberg this whole step is one snapshot commit)
        for b in affected:
            src = os.path.join(tmp, f"bucket={b}")
            dst = os.path.join(final, f"bucket={b}")
            bak = dst + ".__old__"
            if os.path.isdir(bak):
                shutil.rmtree(bak)
            if os.path.isdir(dst):
                os.rename(dst, bak)
            if os.path.isdir(src):
                os.rename(src, dst)
            else:
                os.makedirs(dst, exist_ok=True)  # bucket emptied by deletes
            if os.path.isdir(bak):
                shutil.rmtree(bak)
        shutil.rmtree(tmp)
        # drop stale _SUCCESS markers confusion: leave table-level marker
        return {"buckets_rewritten": len(affected), "n_buckets": n_buckets}

    # -- table maintenance ------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        table: str,
        target_file_mb: int = 256,
        min_files_per_partition: int = 2,
    ) -> dict:
        """Small-file compaction (Iceberg ``rewrite_data_files`` analog).

        Streaming upserts and incremental updates accumulate many small
        parquet files per bucket; at 100 TB small files dominate scan task
        setup and NameNode/manifest pressure. Compaction reads the table
        and atomically re-commits it with files sized toward
        ``target_file_mb`` (row counts and bucket layout preserved — the
        commit path is the same atomic rename, so readers never see a
        partial rewrite). No-op when no partition exceeds
        ``min_files_per_partition`` files. Returns before/after counts."""
        final = self.path(table)
        before = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(final)
            for f in fs if f.endswith(".parquet")
        ]
        by_dir: dict[str, int] = {}
        for p in before:
            by_dir[os.path.dirname(p)] = by_dir.get(os.path.dirname(p), 0) + 1
        if not any(v > min_files_per_partition for v in by_dir.values()):
            return {"table": table, "files_before": len(before),
                    "files_after": len(before), "compacted": False}
        df = self.read(spark, table)
        total_bytes = sum(os.path.getsize(p) for p in before)
        bucketed = "bucket" in df.columns
        if bucketed:
            # preserve bucket layout: one output file per bucket directory
            # unless a bucket is larger than the target
            writer = df.repartition("bucket")
            tmp = final + f".__tmp_{self.run_id}__"
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            writer.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        else:
            n_files = max(1, int(total_bytes / (target_file_mb * 1024 * 1024)) + 1)
            tmp = final + f".__tmp_{self.run_id}__"
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            df.repartition(n_files).write.mode("overwrite").parquet(tmp)
        old = final + ".__old__"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(final, old)
        os.rename(tmp, final)
        shutil.rmtree(old)
        after = [
            f for dp, _, fs in os.walk(final) for f in fs if f.endswith(".parquet")
        ]
        return {"table": table, "files_before": len(before),
                "files_after": len(after), "compacted": True}

    def expire_checkpoints(self, keep_run_ids: set[str]) -> int:
        """Retention for the checkpoint log (Iceberg ``expire_snapshots``
        analog): drop checkpoint rows of runs not in ``keep_run_ids``;
        returns how many were removed. Table data is unaffected — this
        bounds the WAL replay cost, which otherwise grows per run forever."""
        if not os.path.isfile(self._ckpt_path):
            return 0
        kept, dropped = [], 0
        with open(self._ckpt_path) as f:
            for line in f:
                if not line.strip():
                    continue
                row = json.loads(line)
                if row.get("run_id") in keep_run_ids:
                    kept.append(line)
                else:
                    dropped += 1
        if dropped:
            tmp = self._ckpt_path + ".__tmp__"
            with open(tmp, "w") as f:
                f.writelines(kept)
            os.rename(tmp, self._ckpt_path)
        return dropped

    # -- checkpoints ----------------------------------------------------------

    def _load_checkpoints(self) -> dict[tuple[str, str], dict]:
        out = {}
        if os.path.isfile(self._ckpt_path):
            with open(self._ckpt_path) as f:
                for line in f:
                    if line.strip():
                        row = json.loads(line)
                        out[(row["run_id"], row["stage"])] = row
        return out

    def stage_committed(self, stage: str) -> bool:
        row = self._load_checkpoints().get((self.run_id, stage))
        return bool(row and row.get("status") == "committed"
                    and (not row.get("table") or self.exists(row["table"])))

    def commit_checkpoint(self, stage: str, table: str | None, meta: dict | None = None):
        row = {
            "run_id": self.run_id,
            "stage": stage,
            "table": table,
            "status": "committed",
            **(meta or {}),
        }
        with open(self._ckpt_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    # -- lineage / metrics -----------------------------------------------------

    def record_lineage(self, spark: SparkSession, stage: str, table: str, wall_ms: float):
        """Per-partition (parquet file) row counts for the committed table +
        stage wall time → appended to the ``_lineage`` table."""
        df = self.read(spark, table)
        per_part = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("stage", F.lit(stage))
            .withColumn("wall_ms", F.lit(float(wall_ms)))
        )
        mode = "append" if os.path.isdir(os.path.join(self.root, "_lineage")) else "overwrite"
        per_part.coalesce(1).write.mode(mode).parquet(os.path.join(self.root, "_lineage"))

    def record_metrics(self, spark: SparkSession, source: str, counters: dict):
        """Event counters by type (A7 — the reference's
        ``services/metrics_collector.py:194-232`` events-by-type totals):
        appended to the ``_metrics`` table as (run_id, source, metric,
        value). The watch and incremental paths call this per update, fed
        by ``DataFrame.observe`` accumulators (no extra jobs — the metrics
        ride the write action)."""
        rows = [(self.run_id, source, str(k), int(v if v is not None else 0))
                for k, v in sorted(counters.items())]
        df = spark.createDataFrame(
            rows, "run_id string, source string, metric string, value long"
        )
        mode = "append" if os.path.isdir(os.path.join(self.root, "_metrics")) else "overwrite"
        df.coalesce(1).write.mode(mode).parquet(os.path.join(self.root, "_metrics"))

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "_metrics"))

    def lineage_summary(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(os.path.join(self.root, "_lineage"))
        return df.groupBy("run_id", "stage").agg(
            F.sum("rows").alias("rows"),
            F.count("*").alias("partitions"),
            F.max("wall_ms").alias("wall_ms"),
            F.expr("percentile(rows, 0.5)").alias("p50_rows"),
            F.expr("percentile(rows, 0.95)").alias("p95_rows"),
        )


def run_stage(
    wh: Warehouse,
    spark: SparkSession,
    stage: str,
    table: str,
    build_df,
    bucket_col: str | None = None,
    n_buckets: int = 32,
    sort_within: list[str] | None = None,
) -> DataFrame:
    """Execute one resumable stage: skip when already committed for this
    run_id (killed-run restart reads the committed output); otherwise
    materialize atomically, record lineage, then checkpoint."""
    if wh.stage_committed(stage):
        return wh.read(spark, table)
    t0 = time.monotonic()
    df = build_df()
    wh.commit(df, table, bucket_col=bucket_col, n_buckets=n_buckets, sort_within=sort_within)
    wall_ms = (time.monotonic() - t0) * 1000.0
    wh.record_lineage(spark, stage, table, wall_ms)
    wh.commit_checkpoint(stage, table, {"wall_ms": wall_ms})
    return wh.read(spark, table)
