"""Graph JSON export/import (S10 analog, ``sqlite.py:420-529``): dumps nodes
+ edges (+schema_version) as JSON datasets; import supports 'replace' and
'merge' modes (merge = union + dedup on the edge/node key, the UNIQUE
constraint analog)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMA_VERSION = 1
EDGE_KEY = ["subj_id", "pred", "obj_id", "url", "pos"]


def export_graph(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    nodes.withColumn("schema_version", F.lit(SCHEMA_VERSION)).write.mode(
        "overwrite").json(os.path.join(out_dir, "nodes"))
    edges.withColumn("schema_version", F.lit(SCHEMA_VERSION)).write.mode(
        "overwrite").json(os.path.join(out_dir, "edges"))


def import_graph(
    spark: SparkSession,
    in_dir: str,
    existing_nodes: DataFrame | None = None,
    existing_edges: DataFrame | None = None,
    mode: str = "replace",
) -> tuple[DataFrame, DataFrame]:
    nodes = spark.read.json(os.path.join(in_dir, "nodes")).drop("schema_version")
    edges = spark.read.json(os.path.join(in_dir, "edges")).drop("schema_version")
    if mode == "merge" and existing_nodes is not None and existing_edges is not None:
        nodes = existing_nodes.unionByName(nodes, allowMissingColumns=True).dropDuplicates(
            ["node_id"]
        )
        edges = existing_edges.unionByName(edges, allowMissingColumns=True).dropDuplicates(
            EDGE_KEY
        )
    return nodes, edges
