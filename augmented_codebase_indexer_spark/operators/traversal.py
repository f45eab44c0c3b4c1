"""Graph traversal + topological analysis (J4 / O5 analogs).

* ``neighborhood`` — depth-≤N reachable set via iterative frontier joins
  (the reference's WITH RECURSIVE CTEs, ``sqlite.py:221-333``; depth capped
  at 3 per ``graph_models.py:141``). Frontier stays a DataFrame: each hop is
  one equi-join + distinct; accumulated visits via unionByName.
* ``callers`` / ``callees`` directions map to joining on obj/subj.
* ``topological_layers`` — Kahn's algorithm as a driver loop (O5,
  ``topology_analyzer.py:124-168``): repeatedly peel in-degree-0 nodes.
  Deterministic: layer index is a function of the graph, not of order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .guards import register_pin


def neighborhood(
    edges: DataFrame,
    start_ids: list,
    depth: int = 3,
    direction: str = "out",
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
) -> DataFrame:
    """Nodes reachable from start_ids in ≤ depth hops → (node_id, hops)
    with the MINIMUM hop count (start nodes at 0). direction: 'out' follows
    src→dst (callees), 'in' follows dst→src (callers)."""
    spark = edges.sparkSession
    a, b = (src_col, dst_col) if direction == "out" else (dst_col, src_col)
    hop = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).distinct()
    hop = register_pin(hop.localCheckpoint(eager=True))

    visited = spark.createDataFrame(
        [(x, 0) for x in start_ids], schema="node_id string, hops int"
    )
    frontier = visited.select("node_id")
    for d in range(1, depth + 1):
        nxt = (
            hop.join(frontier, hop.src == frontier.node_id)
            .select(F.col("dst").alias("node_id"))
            .distinct()
            .join(visited.select("node_id"), "node_id", "left_anti")
        )
        nxt = register_pin(nxt.localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt.withColumn("hops", F.lit(d)))
        visited = register_pin(visited.localCheckpoint(eager=True))
        frontier = nxt.select("node_id")
    return visited


def topological_layers(edges: DataFrame, nodes: DataFrame, max_iters: int = 1000) -> DataFrame:
    """Kahn layering of a DAG: (node_id, layer). Nodes in cycles never reach
    in-degree 0 and are returned with layer = -1 (cycle detection,
    ``topology_analyzer.py:59-118``)."""
    remaining_nodes = register_pin(nodes.select("node_id").distinct().localCheckpoint(eager=True))
    remaining_edges = register_pin(edges.select("src", "dst").distinct().localCheckpoint(eager=True))
    out = None
    layer = 0
    while layer < max_iters:
        with_in = remaining_edges.select(F.col("dst").alias("node_id")).distinct()
        zero_in = remaining_nodes.join(with_in, "node_id", "left_anti")
        zero_in = register_pin(zero_in.localCheckpoint(eager=True))
        if zero_in.isEmpty():
            break
        tagged = zero_in.withColumn("layer", F.lit(layer))
        out = tagged if out is None else out.unionByName(tagged)
        remaining_nodes = remaining_nodes.join(zero_in, "node_id", "left_anti")
        remaining_edges = remaining_edges.join(
            zero_in.withColumnRenamed("node_id", "src"), "src", "left_anti"
        )
        remaining_nodes = register_pin(remaining_nodes.localCheckpoint(eager=True))
        remaining_edges = register_pin(remaining_edges.localCheckpoint(eager=True))
        layer += 1
    cyclic = remaining_nodes.withColumn("layer", F.lit(-1))
    return cyclic if out is None else out.unionByName(cyclic)
