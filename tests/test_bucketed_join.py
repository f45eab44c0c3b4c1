"""Bucketing for co-located joins (SURVEY.md §4 / instructions: "use
bucketing for co-located joins"): two tables bucketed+sorted on the join
key join WITHOUT any Exchange in the executed plan — the shuffle was paid
once at write time, every subsequent join is free. This is the strategy for
the recurring edges⋈nodes / edges⋈edges joins at 100 TB."""

import pytest
from pyspark.sql import functions as F


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        e = spark.range(0, 10000).select(
            (F.col("id") % 500).alias("subj_id"), F.col("id").alias("edge_attr")
        )
        n = spark.range(0, 500).select(
            F.col("id").alias("subj_id"), F.sha2(F.col("id").cast("string"), 256).alias("name")
        )
        spark.sql("DROP TABLE IF EXISTS b_edges")
        spark.sql("DROP TABLE IF EXISTS b_nodes")
        (e.write.bucketBy(8, "subj_id").sortBy("subj_id").mode("overwrite")
         .saveAsTable("b_edges"))
        (n.write.bucketBy(8, "subj_id").sortBy("subj_id").mode("overwrite")
         .saveAsTable("b_nodes"))

        joined = spark.table("b_edges").join(spark.table("b_nodes"), "subj_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle at query time
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_edges")
        spark.sql("DROP TABLE IF EXISTS b_nodes")
