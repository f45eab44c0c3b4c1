"""DataFrame PageRank (A3 analog, ``services/pagerank_scorer.py:34-107``).

Reference constants kept exactly: damping 0.85, max 50 iterations,
tolerance 1e-6, dangling-mass redistribution (``pagerank_scorer.py:22-27,
75-80``). Expressed as iterative DataFrame joins:

    contribs = ranks ⋈ out_degree ⋈ edges → groupBy(dst).sum(rank/deg)
    rank'    = (1−d)/N + d · (contribs + dangling_mass/N)

Skew: the groupBy(dst) sum is algebraic → map-side partial aggregation
absorbs hot destinations; the edges⋈ranks join relies on AQE skew split,
with an optional explicit salt for pathological hubs. ``localCheckpoint``
every few rounds keeps the plan linear-free. L1 convergence check mirrors
``pagerank_scorer.py:97-103``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
MAX_ITERS = 50
TOL = 1e-6


def pagerank(
    edges: DataFrame,
    damping: float = DAMPING,
    max_iters: int = MAX_ITERS,
    tol: float = TOL,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    checkpoint_every: int = 5,
) -> DataFrame:
    """edges(src, dst) (deduped per pair) → (node_id, pagerank). Node set =
    union of endpoints. Deterministic for a given edge set."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionByName(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n

    for i in range(max_iters):
        with_deg = ranks.join(out_deg, ranks.node_id == out_deg.src, "left")
        # dangling nodes: no out-edges → their whole rank mass redistributes
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0))
        ).collect()[0][0]
        contribs = (
            e.join(ranks.withColumnRenamed("node_id", "src"), "src")
            .join(out_deg, "src")
            .select(F.col("dst").alias("node_id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node_id")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            nodes.join(contribs, "node_id", "left")
            .select(
                "node_id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
        if i % checkpoint_every == checkpoint_every - 1:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        else:
            new_ranks = new_ranks.cache()
        delta = (
            new_ranks.withColumnRenamed("rank", "r2")
            .join(ranks, "node_id")
            .agg(F.sum(F.abs(F.col("r2") - F.col("rank"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks.select("node_id", F.col("rank").alias("pagerank"))
