"""Graph export/import (S10 analog, ``sqlite.py:420-529``).

Three formats:
  * **JSON datasets** (the reference's own format): nodes + edges
    (+schema_version); import supports 'replace' and 'merge' modes
    (merge = union + dedup on the edge/node key, the UNIQUE constraint
    analog). Distributed read/write — the scale path.
  * **JSON-LD (NDJSON)**: every node/edge is a standalone JSON-LD object
    with ``@context``/``@type``/``@id``, written as Spark JSON datasets —
    still fully distributed, interoperable with linked-data tooling.
  * **GraphML**: the standard XML interchange format (Gephi/NetworkX/
    igraph). Inherently ONE XML document ⇒ single-writer by definition;
    the export streams rows through ``toLocalIterator`` (never
    ``collect`` — one partition in memory at a time) and is meant for
    interchange-sized graphs, not the 100 TB path (use JSON/JSON-LD there).
"""

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


# ---------------------------------------------------------------------------
# JSON-LD (distributed, line-oriented)
# ---------------------------------------------------------------------------

JSONLD_CONTEXT = "https://schema.org/"


def export_jsonld(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """Nodes → ``{"@context", "@type": "Thing", "@id": node_id, ...}``;
    edges → ``{"@type": "Relation", "subject", "predicate", "object",
    provenance}``. Plain Spark JSON writes — fully distributed."""
    n = nodes.select(
        F.lit(JSONLD_CONTEXT).alias("@context"),
        F.lit("Thing").alias("@type"),
        F.col("node_id").alias("@id"),
        *[c for c in nodes.columns if c != "node_id"],
    )
    e = edges.select(
        F.lit(JSONLD_CONTEXT).alias("@context"),
        F.lit("Relation").alias("@type"),
        F.col("subj_id").alias("subject"),
        F.col("pred").alias("predicate"),
        F.col("obj_id").alias("object"),
        *[c for c in edges.columns if c not in ("subj_id", "pred", "obj_id")],
    )
    n.write.mode("overwrite").json(os.path.join(out_dir, "nodes_jsonld"))
    e.write.mode("overwrite").json(os.path.join(out_dir, "edges_jsonld"))


def import_jsonld(spark: SparkSession, in_dir: str) -> tuple[DataFrame, DataFrame]:
    nodes = (
        spark.read.json(os.path.join(in_dir, "nodes_jsonld"))
        .withColumnRenamed("@id", "node_id").drop("@context", "@type")
    )
    edges = (
        spark.read.json(os.path.join(in_dir, "edges_jsonld"))
        .withColumnRenamed("subject", "subj_id")
        .withColumnRenamed("predicate", "pred")
        .withColumnRenamed("object", "obj_id")
        .drop("@context", "@type")
    )
    return nodes, edges


# ---------------------------------------------------------------------------
# GraphML (single-document interchange; streamed, never collected)
# ---------------------------------------------------------------------------


def export_graphml(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """One GraphML document with node/edge attributes as <data> keys.
    Rows stream through ``toLocalIterator`` (one partition at a time);
    values XML-escaped. Interchange format — see module docstring."""
    from xml.sax.saxutils import escape

    node_attrs = [c for c in nodes.columns if c != "node_id"]
    edge_attrs = [c for c in edges.columns
                  if c not in ("subj_id", "obj_id", "bucket")]
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
        for i, a in enumerate(node_attrs):
            f.write(f'  <key id="n{i}" for="node" attr.name="{escape(a)}" '
                    'attr.type="string"/>\n')
        for i, a in enumerate(edge_attrs):
            f.write(f'  <key id="e{i}" for="edge" attr.name="{escape(a)}" '
                    'attr.type="string"/>\n')
        f.write('  <graph id="G" edgedefault="directed">\n')
        for r in nodes.toLocalIterator():
            f.write(f'    <node id="{escape(str(r["node_id"]))}">\n')
            for i, a in enumerate(node_attrs):
                if r[a] is not None:
                    f.write(f'      <data key="n{i}">{escape(str(r[a]))}</data>\n')
            f.write("    </node>\n")
        for r in edges.toLocalIterator():
            f.write(f'    <edge source="{escape(str(r["subj_id"]))}" '
                    f'target="{escape(str(r["obj_id"]))}">\n')
            for i, a in enumerate(edge_attrs):
                if r[a] is not None:
                    f.write(f'      <data key="e{i}">{escape(str(r[a]))}</data>\n')
            f.write("    </edge>\n")
        f.write("  </graph>\n</graphml>\n")


def import_graphml(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Parse a GraphML file back to (nodes, edges) DataFrames (driver-side
    parse — interchange path, matching the single-document format)."""
    import xml.etree.ElementTree as ET

    ns = {"g": "http://graphml.graphdrawing.org/xmlns"}
    root = ET.parse(path).getroot()
    keys = {k.get("id"): k.get("attr.name") for k in root.findall("g:key", ns)}
    nrows, erows = [], []
    graph = root.find("g:graph", ns)
    for el in graph.findall("g:node", ns):
        row = {"node_id": el.get("id")}
        for d in el.findall("g:data", ns):
            row[keys[d.get("key")]] = d.text
        nrows.append(row)
    for el in graph.findall("g:edge", ns):
        row = {"subj_id": el.get("source"), "obj_id": el.get("target")}
        for d in el.findall("g:data", ns):
            row[keys[d.get("key")]] = d.text
        erows.append(row)
    return spark.createDataFrame(nrows), spark.createDataFrame(erows)
