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


def merge_prefer(
    first: DataFrame, second: DataFrame, key: list[str]
) -> DataFrame:
    """Union two frames and keep ONE row per key, rows from ``first``
    winning ties — the deterministic merge primitive shared by
    ``import_graph`` and the CLI import verb (a bare ``dropDuplicates``
    after a union has a nondeterministic winner; ADVICE r4). One
    key-partitioned window, no collect.

    Determinism holds WITHIN one input too (ADVICE r5): after ``__pri``
    the window orders by every remaining non-key column (name-sorted),
    so duplicate keys inside ``first`` or ``second`` pick a stable
    winner instead of whichever partition arrives first."""
    from pyspark.sql import Window

    u = first.withColumn("__pri", F.lit(0)).unionByName(
        second.withColumn("__pri", F.lit(1)), allowMissingColumns=True
    )
    tiebreak = [
        F.asc_nulls_last(c) for c in sorted(u.columns)
        if c not in key and c != "__pri"
    ]
    w = Window.partitionBy(*key).orderBy(F.asc("__pri"), *tiebreak)
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__pri", "__rn")
    )


def import_graph(
    spark: SparkSession,
    in_dir: str,
    existing_nodes: DataFrame | None = None,
    existing_edges: DataFrame | None = None,
    mode: str = "replace",
    prefer: str = "existing",
) -> tuple[DataFrame, DataFrame]:
    """``mode='merge'`` resolves key conflicts deterministically via
    ``merge_prefer``: ``prefer='existing'`` (default — a restore can't
    clobber provenance-rich rows) or ``prefer='imported'`` (the
    reference's INSERT OR REPLACE semantics, ``sqlite.py:466-487``, for
    the restore-newer-dump-over-old-warehouse case)."""
    if prefer not in ("existing", "imported"):
        raise ValueError(f"prefer must be 'existing' or 'imported', got {prefer!r}")
    nodes = spark.read.json(os.path.join(in_dir, "nodes")).drop("schema_version")
    edges = spark.read.json(os.path.join(in_dir, "edges")).drop("schema_version")
    if mode == "merge" and existing_nodes is not None and existing_edges is not None:
        if prefer == "existing":
            nodes = merge_prefer(existing_nodes, nodes, ["node_id"])
            edges = merge_prefer(existing_edges, edges, EDGE_KEY)
        else:
            nodes = merge_prefer(nodes, existing_nodes, ["node_id"])
            edges = merge_prefer(edges, existing_edges, EDGE_KEY)
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


# ---------------------------------------------------------------------------
# N-Triples (W3C RDF line format; distributed, line-oriented)
# ---------------------------------------------------------------------------

NT_BASE = "https://kg.example/"


def _nt_escape(col):
    """N-Triples string escaping (W3C spec §canonical): backslash, quote,
    and the control characters with dedicated escapes."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    return F.regexp_replace(out, "\t", r"\\t")


def _iri(kind: str, col):
    # url-encode the id into the IRI path (space and angle brackets are
    # illegal inside IRIs; url_encode covers them and more)
    return F.concat(
        F.lit("<" + NT_BASE + kind + "/"), F.url_encode(col), F.lit(">")
    )


def export_ntriples(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """W3C N-Triples: one ``<s> <p> <o> .`` statement per line — the RDF
    interchange format every triple store loads natively. Entity-entity
    edges become IRI triples; node metadata (canonical_name, entity_type)
    become literal triples. Line-oriented ⇒ a plain distributed text
    write, same scale path as JSON/JSON-LD (GraphML remains the one
    single-writer format)."""
    stmts = edges.select(
        F.concat_ws(
            " ", _iri("entity", F.col("subj_id")), _iri("rel", F.col("pred")),
            _iri("entity", F.col("obj_id")), F.lit("."),
        ).alias("value")
    )
    name = nodes.filter(F.col("canonical_name").isNotNull()).select(
        F.concat_ws(
            " ", _iri("entity", F.col("node_id")),
            F.lit("<" + NT_BASE + "prop/canonical_name>"),
            F.concat(F.lit('"'), _nt_escape(F.col("canonical_name")), F.lit('"')),
            F.lit("."),
        ).alias("value")
    )
    typ = nodes.filter(F.col("entity_type").isNotNull()).select(
        F.concat_ws(
            " ", _iri("entity", F.col("node_id")),
            F.lit("<" + NT_BASE + "prop/entity_type>"),
            F.concat(F.lit('"'), _nt_escape(F.col("entity_type")), F.lit('"')),
            F.lit("."),
        ).alias("value")
    )
    stmts.unionAll(name).unionAll(typ).write.mode("overwrite").text(out_dir)


def import_ntriples(spark: SparkSession, in_dir: str) -> tuple[DataFrame, DataFrame]:
    """Parse the subset :func:`export_ntriples` emits back into (nodes,
    edges): IRI-object lines → edges, literal-object lines → node
    properties pivoted to (node_id, canonical_name, entity_type)."""
    ent = NT_BASE + "entity/"
    lines = spark.read.text(in_dir).filter(F.length("value") > 0)
    parts = lines.select(
        F.regexp_extract("value", r"^<([^>]*)> <([^>]*)> (.*) \.$", 1).alias("s"),
        F.regexp_extract("value", r"^<([^>]*)> <([^>]*)> (.*) \.$", 2).alias("p"),
        F.regexp_extract("value", r"^<([^>]*)> <([^>]*)> (.*) \.$", 3).alias("o"),
    )
    subj = F.url_decode(F.expr(f"substring(s, {len(ent) + 1})"))
    edges = parts.filter(F.col("o").startswith("<" + ent)).select(
        subj.alias("subj_id"),
        F.url_decode(F.expr(f"substring(p, {len(NT_BASE + 'rel/') + 1})")).alias("pred"),
        F.url_decode(
            F.regexp_extract("o", r"^<(.*)>$", 1).substr(F.lit(len(ent) + 1), F.lit(1 << 20))
        ).alias("obj_id"),
    )
    lit_val = F.regexp_extract("o", r'^"(.*)"$', 1)
    # single-pass-correct unescape: park escaped backslashes behind a NUL
    # sentinel FIRST (NUL cannot appear in our literals — the extraction
    # guards drop NUL-bearing pages), else "\\n" (backslash + n) would be
    # misread as a newline escape
    unescaped = F.regexp_replace(lit_val, r"\\\\", "\x00")
    for esc, ch in ((r"\\n", "\n"), (r"\\r", "\r"), (r"\\t", "\t"), (r"\\\"", '"')):
        unescaped = F.regexp_replace(unescaped, esc, ch)
    unescaped = F.regexp_replace(unescaped, "\x00", r"\\")
    props = parts.filter(~F.col("o").startswith("<")).select(
        subj.alias("node_id"),
        F.regexp_extract("p", r"prop/(.*)$", 1).alias("prop"),
        unescaped.alias("val"),
    )
    nodes = (
        props.groupBy("node_id")
        .pivot("prop", ["canonical_name", "entity_type"])
        .agg(F.first("val"))
    )
    return nodes, edges
