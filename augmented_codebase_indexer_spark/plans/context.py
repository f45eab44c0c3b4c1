"""Context assembly (SURVEY.md §3.3 — ``ContextAssembler.assemble`` analog).

Given seed entities: depth-≤3 neighborhood (J4) → enrich with node metadata
+ PageRank → order by PageRank desc → TOKEN-BUDGET truncation (the
reference drops lowest-ranked neighbors until the package fits,
``context_assembler.py:418-454``) expressed as a running-sum window cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.traversal import neighborhood


def assemble_context(
    edges: DataFrame,
    nodes: DataFrame,
    ranks: DataFrame,
    seed_ids: list[str],
    depth: int = 3,
    token_budget: int = 2000,
    tokens_per_node: int = 50,
) -> DataFrame:
    """→ (node_id, hops, pagerank, canonical_name, entity_type, cum_tokens)
    — the highest-PageRank neighborhood slice that fits the budget; seeds
    always survive (hops 0 sorts first on ties via hops asc)."""
    hood = neighborhood(edges, seed_ids, depth=depth, direction="out")
    enriched = (
        hood.join(ranks, "node_id", "left")
        .join(nodes, "node_id", "left")
        .select(
            "node_id", "hops",
            F.coalesce(F.col("pagerank"), F.lit(0.0)).alias("pagerank"),
            "canonical_name", "entity_type",
        )
    )
    # seeds (hops=0) first, then pagerank desc; running token sum caps the set
    w = Window.orderBy(F.when(F.col("hops") == 0, 0).otherwise(1),
                       F.desc("pagerank"), F.asc("node_id"))
    return (
        enriched.withColumn(
            "cum_tokens",
            F.sum(F.lit(tokens_per_node)).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("cum_tokens") <= token_budget)
    )
