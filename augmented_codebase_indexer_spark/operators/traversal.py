"""Graph traversal + topological analysis (J4 / O5 analogs).

* ``neighborhood`` — depth-≤N reachable set via iterative frontier joins
  (the reference's WITH RECURSIVE CTEs, ``sqlite.py:221-333``; depth capped
  at 3 per ``graph_models.py:141``). Frontier stays a DataFrame: each hop is
  one equi-join + distinct; accumulated visits via unionByName.
* ``callers`` / ``callees`` directions map to joining on obj/subj.
* ``topological_layers`` — Kahn's algorithm as a driver loop (O5,
  ``topology_analyzer.py:124-168``): repeatedly peel in-degree-0 nodes.
  Deterministic: layer index is a function of the graph, not of order.
* ``taxonomy_closure`` — bounded min-hop transitive closure of an
  ``is_a`` edge list (ancestor sets for Hearst-extracted taxonomies).
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


def taxonomy_closure(
    edges: DataFrame,
    max_hops: int = 3,
    src: str = "hypo",
    dst: str = "hyper",
) -> DataFrame:
    """Bounded transitive closure of a taxonomy edge list —
    (hypo, hyper, hops) with ``hops`` = MINIMUM hop count ≤ ``max_hops``.
    The ancestor set a Hearst-extracted ``is_a`` layer needs before type
    inference (``x is_a Felines`` should also answer ``x is_a Animals``).

    Same bounded-hop discipline as :func:`neighborhood` (the reference
    caps recursion at 3, `graph_models.py:141`): each hop is ONE
    equi-join of the current frontier against the slim distinct edge
    set, min-hops dedup at the end collapses diamond paths. Cycles
    cannot loop it — the frontier is hop-stamped and the loop is a
    compile-time-bounded range, so a cyclic taxonomy just yields its
    ≤max_hops unrolling. Scale: frontiers and edges are (id, id) pairs;
    at 10^9 taxonomy edges every join is a fixed-width id shuffle and
    the accumulated union is resolved by one final groupBy-min."""
    e = register_pin(
        edges.select(F.col(src).alias("hypo"), F.col(dst).alias("hyper"))
        .distinct()
        .persist()
    )
    acc = e.withColumn("hops", F.lit(1).cast("long"))
    frontier = acc
    for hop in range(2, max_hops + 1):
        step = e.select(
            F.col("hypo").alias("_mid"), F.col("hyper").alias("_up")
        )
        frontier = (
            frontier.join(step, frontier["hyper"] == step["_mid"])
            .select(
                "hypo",
                F.col("_up").alias("hyper"),
                F.lit(hop).cast("long").alias("hops"),
            )
            .distinct()
        )
        acc = acc.unionByName(frontier)
    return acc.groupBy("hypo", "hyper").agg(F.min("hops").alias("hops"))


def taxonomy_closure_sql(edges_sql: str, max_hops: int = 3) -> str:
    """DuckDB mirror: WITH RECURSIVE over the same edge list — an
    independent formulation of the closure."""
    return f"""
    WITH RECURSIVE e AS (SELECT DISTINCT hypo, hyper FROM ({edges_sql})),
    c AS (
      SELECT hypo, hyper, 1 AS hops FROM e
      UNION ALL
      SELECT c.hypo, e.hyper, c.hops + 1
      FROM c JOIN e ON c.hyper = e.hypo
      WHERE c.hops < {max_hops}
    )
    SELECT hypo, hyper, CAST(min(hops) AS BIGINT) AS hops
    FROM c GROUP BY hypo, hyper
    """
