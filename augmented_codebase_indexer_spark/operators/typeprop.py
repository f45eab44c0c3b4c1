"""Seeded type propagation — spread entity types from a typed seed set
across the alias/sameAs graph by clamped majority vote, fixed rounds.

The graph-based half of type inference (label spreading with seed
clamping, Zhou et al. NIPS'03; the relational form of SDType's "types
flow along relations" intuition): SDType induction
(`operators/typeinduction.py`) types entities that FACTS touch, but a
web KG always carries a large untyped fringe connected to typed
entities through alias edges (anchor aliases, acronym pairs, redirect
chains, ER matches). Each round, every still-untyped node adopts the
MAJORITY type among its typed neighbors — count ties break on type
text (the fusion argmax discipline), seeds never change (clamped),
and a node typed in round r propagates from round r+1 on. Fixed
``rounds`` (default 3): type information provably travels ≤ rounds
hops from a seed, and the oracle unrolls the same rounds as nested
CTEs — the fusion/redirect precedent for loop gates.

Output: (entity, type, round_assigned) — round 0 for seeds; nodes
unreachable from any seed within ``rounds`` hops are absent (honest:
no default type).

Scale shape at 10^10 edges: per round, one adjacency join against the
CURRENT frontier... strictly, against the typed set — kept slim as
(entity, type) ids — one (node, type) aggregate (map-side combined),
one argmax as groupBy-min(struct) (no window), one anti-join to
restrict to untyped nodes. Frames are localCheckpointed per round
(pin-scope registered) so lineage stays flat.

Reference anchor: the reference resolves a symbol's kind through its
alias chain when the definition site is elsewhere (`core/linker`);
this is the bulk form over the whole alias graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.guards import register_pin


def propagate_types(
    edges: DataFrame, seeds: DataFrame, rounds: int = 3
) -> DataFrame:
    """edges(a, b) alias relation (undirected), seeds(entity, type) →
    (entity, type, round_assigned)."""
    e = edges.select("a", "b").filter(F.col("a") != F.col("b")).distinct()
    adj = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    typed = register_pin(
        seeds.select("entity", "type").distinct()
        .withColumn("round_assigned", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for r in range(1, rounds + 1):
        votes = (
            adj.join(typed.select(F.col("entity").alias("b"), "type"), "b")
            .select(F.col("a").alias("entity"), "type")
            .join(typed.select("entity"), "entity", "left_anti")
            .groupBy("entity", "type")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        pick = F.struct((-F.col("cnt")).alias("neg"),
                        F.col("type").alias("t"))
        new = (
            votes.groupBy("entity")
            .agg(F.min(pick).alias("b"))
            .select(
                "entity", F.col("b.t").alias("type"),
                F.lit(r).cast("long").alias("round_assigned"),
            )
        )
        typed = register_pin(
            typed.unionByName(new).localCheckpoint(eager=True))
    return typed


def propagate_types_oracle_sql(
    edges_sql: str, seeds_sql: str, rounds: int = 3
) -> str:
    """DuckDB mirror of :func:`propagate_types` — the fixed rounds
    unrolled as a chain of MATERIALIZED CTEs."""
    sql = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT a, b FROM ({edges_sql}) WHERE a <> b),
    adj AS MATERIALIZED (
      SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
    t0 AS MATERIALIZED (
      SELECT DISTINCT entity, type, CAST(0 AS BIGINT) AS round_assigned
      FROM ({seeds_sql}))"""
    prev = "t0"
    for r in range(1, rounds + 1):
        sql += f""",
    v{r} AS MATERIALIZED (
      SELECT adj.a AS entity, t.type, CAST(count(*) AS BIGINT) AS cnt
      FROM adj JOIN {prev} t ON adj.b = t.entity
      WHERE adj.a NOT IN (SELECT entity FROM {prev})
      GROUP BY adj.a, t.type),
    n{r} AS MATERIALIZED (
      SELECT entity, type, CAST({r} AS BIGINT) AS round_assigned
      FROM (SELECT entity, type, row_number() OVER (
              PARTITION BY entity ORDER BY cnt DESC, type ASC) AS rn
            FROM v{r})
      WHERE rn = 1),
    t{r} AS MATERIALIZED (
      SELECT * FROM {prev} UNION ALL SELECT * FROM n{r})"""
        prev = f"t{r}"
    return sql + f"\n    SELECT entity, type, round_assigned FROM {prev}\n"
