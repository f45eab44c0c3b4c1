"""Weighted single-source(-set) shortest paths — fixed-round
Bellman-Ford (Bellman 1958; the Pregel/GraphX SSSP canonical example)
over the directed entity graph with non-negative INTEGER edge weights.
The KG read paths need distances, not just reachability
(`operators/traversal.py` holds the ≤k-hop membership tier): "how far
is every entity from the seed set" powers related-entity ordering,
context assembly radius budgets, and taxonomy-distance features.

Semantics: after ``rounds`` synchronous relaxations, ``dist`` is exact
for every node whose shortest path uses ≤ ``rounds`` edges — the same
fixed-depth contract as the traversal/closure operators (web KGs are
shallow; a bounded horizon is the product semantics, not an
approximation of an infinite one).  Unreached nodes are absent (sparse
convention).  Ties need no tie-break: min over BIGINT distances is a
total order.

Exactness: distances are BIGINT sums of BIGINT weights; every round is
``dist' = min(dist, min_{(u,v,w)}(dist[u] + w))`` — integer min/plus
only, no floats anywhere.

Scale shape at 10^9 nodes: each round = ONE node-keyed equi-join of the
slim (node, dist) frontier against the edge relation (co-located under
src bucketing) + one map-side-combinable min-groupBy; the relation
never exceeds (reached nodes) rows and carries two integers.  Rounds
are statically bounded → the physical plan is a fixed-depth tree
(restartable per round; `localCheckpoint` lineage cuts are unnecessary
below ~8 rounds and available above — matched to the taxonomy-closure
discipline).

Reference anchor: the reference's graph traversal expands context by
hop depth (`src/aci/services/context_assembler.py` neighborhood
expansion) — this adds the weighted-distance ordering it can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    seed_col: str = "node",
) -> DataFrame:
    """→ (node, dist): exact min distance from the seed SET for every
    node reachable within ``rounds`` edges.  Weights must be
    non-negative BIGINTs (validated relationally downstream — a
    negative weight makes fixed-round Bellman-Ford a lower bound, so
    callers gate on ``min(w) >= 0`` where the edge table is untrusted);
    parallel edges are fine (the min absorbs them)."""
    if not 1 <= rounds <= 16:
        raise ValueError("shortest_paths: rounds must be in [1, 16]")
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    dist = seeds.select(F.col(seed_col).alias("node")).distinct().select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    for _ in range(rounds):
        relaxed = (
            e.join(dist.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"),
                    (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist


def shortest_paths_oracle_sql(
    edges_sql: str, seeds_sql: str, rounds: int = 4
) -> str:
    """DuckDB mirror: one (relax, fold) CTE pair per round, edges
    materialized once."""
    parts = [
        f"""WITH e AS MATERIALIZED (
      SELECT src, dst, CAST(w AS BIGINT) AS w FROM ({edges_sql})),
    d0 AS (SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist
           FROM ({seeds_sql}))"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""r{r} AS (
      SELECT e.dst AS node, d.dist + e.w AS dist
      FROM e JOIN d{r - 1} d ON d.node = e.src),
    d{r} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{r - 1}
        UNION ALL SELECT node, dist FROM r{r}) GROUP BY node)"""
        )
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT node, dist FROM d{rounds}"
    )


def shortest_paths_py(
    edges: list[tuple[str, str, int]], seeds: list[str], rounds: int = 4
) -> list[tuple[str, int]]:
    """Pure-python mirror for tests: [(node, dist)] sorted."""
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        new = dict(dist)
        for u, v, w in edges:
            if u in dist and dist[u] + w < new.get(v, 1 << 62):
                new[v] = dist[u] + w
        dist = new
    return sorted(dist.items())
