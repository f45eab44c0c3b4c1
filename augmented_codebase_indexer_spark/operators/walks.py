"""Deterministic random walks — the graph-embedding corpus generator
(DeepWalk, Perozzi et al. KDD'14; node2vec, Grover & Leskovec KDD'16
sample uniform/biased walks and feed them to skip-gram). A 100 TB KG
pipeline emits these walk sequences as TRAINING DATA, so they belong to
the same exactness regime as every other gated output: the "random"
next-hop choice is a HASH of (start, walk#, step) reduced modulo the
current node's out-degree — deterministic, seedable, identical in both
engines via the md5 ``H60`` primitive (``functions/sqlhash.py``), and
statistically uniform per step. No RNG state, no driver loop.

Shape at scale: the neighbor table gets a per-source index once (one
window over the adjacency — partitioned by node, never global); each of
the ``walk_len`` steps is ONE equi-join of the walk frontier against
the indexed adjacency on (node, chosen_idx). With adjacency bucketed by
node (``sources/catalog.py`` discipline) the joins co-locate; frontier
rows are 4 slim columns. Walks leaving a dangling node (no out-edges)
simply END — the inner join drops them, the standard DeepWalk
truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sqlhash import h60_expr


def _choice_expr(dialect: str, step: int, seed: str) -> str:
    """The per-step hash the walker reduces mod degree: identical string
    input in both engines → identical 60-bit value."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    key = (
        f"concat(start_node, '#', CAST(walk AS {s}), '#', "
        f"'{seed}', '#', '{step}')"
    )
    return h60_expr(key, dialect)


def deterministic_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    seed: str = "w0",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """→ (start_node, walk, step, node): ``walks_per_node`` walks of up
    to ``walk_len`` hops from every node with out-edges; step 0 is the
    start itself. Directed; self-loops dropped; duplicate edges collapse
    (the neighbor INDEX is over distinct neighbors, so multi-edges don't
    bias the choice)."""
    adj = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .filter(F.col("node") != F.col("nbr"))
        .distinct()
    )
    w_idx = Window.partitionBy("node").orderBy(F.asc("nbr"))
    adj = adj.withColumn("idx", F.row_number().over(w_idx) - 1).withColumn(
        "deg", F.count("*").over(Window.partitionBy("node"))
    )
    starts = adj.select("node").distinct()
    frontier = starts.select(
        F.col("node").alias("start_node"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("walk"),
        F.lit(0).alias("step"),
        F.col("node").alias("node"),
    )
    out = [frontier]
    for step in range(1, walk_len + 1):
        choice = F.expr(_choice_expr("spark", step, seed))
        hop = (
            out[-1]
            .select("start_node", "walk", F.col("node").alias("_cur"))
            .join(
                adj.select(
                    F.col("node").alias("_cur"), "idx", "nbr", "deg"
                ),
                "_cur",
            )
            .filter(F.col("idx") == choice % F.col("deg"))
            .select(
                "start_node", "walk", F.lit(step).alias("step"),
                F.col("nbr").alias("node"),
            )
        )
        out.append(hop)
    res = out[0]
    for frame in out[1:]:
        res = res.unionByName(frame)
    return res.select(
        "start_node", F.col("walk").cast("long").alias("walk"),
        F.col("step").cast("long").alias("step"), "node",
    )


def walks_oracle_sql(
    edges_sql: str,
    walk_len: int = 4,
    walks_per_node: int = 2,
    seed: str = "w0",
) -> str:
    """DuckDB mirror — identical adjacency indexing (ORDER BY nbr), the
    same md5 choice expression, the same truncation semantics, unrolled
    one CTE per step."""
    parts = [
        f"WITH e AS ({edges_sql})",
        """adj AS (
      SELECT node, nbr,
             row_number() OVER (PARTITION BY node ORDER BY nbr) - 1 AS idx,
             count(*) OVER (PARTITION BY node) AS deg
      FROM (SELECT DISTINCT src AS node, dst AS nbr FROM e
            WHERE src <> dst))""",
        f"""s0 AS (
      SELECT node AS start_node, w.walk, 0 AS step, node
      FROM (SELECT DISTINCT node FROM adj)
      CROSS JOIN (SELECT unnest(range(0, {walks_per_node})) AS walk) w)""",
    ]
    for step in range(1, walk_len + 1):
        choice = _choice_expr("duckdb", step, seed)
        parts.append(
            f"""s{step} AS (
      SELECT s.start_node, s.walk, {step} AS step, a.nbr AS node
      FROM s{step - 1} s JOIN adj a ON a.node = s.node
      WHERE a.idx = ({choice}) % a.deg)"""
        )
    union = "\n    UNION ALL ".join(
        f"SELECT * FROM s{k}" for k in range(walk_len + 1)
    )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT start_node, CAST(walk AS BIGINT) AS walk,
           CAST(step AS BIGINT) AS step, node
    FROM ({union})
    """
    )


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """→ (center, context, n): the skip-gram co-occurrence counts over
    the walk corpus — the actual training input of DeepWalk/node2vec
    (walk sentences → word2vec pairs within ``window`` steps; Perozzi
    KDD'14 §4.2). Aggregated to counts because that is what both a
    negative-sampling trainer and a PMI factorization consume (Levy &
    Goldberg NIPS'14: SGNS factorizes the shifted PMI of exactly these
    counts).

    One self-equi-join on (start_node, walk) — walk-id keyed, so it
    co-locates with how the walk generator already partitioned — then
    the |Δstep| ≤ window band filter, then a map-side-combinable count.
    Directionless pairs come out as BOTH (a,b) and (b,a) rows (standard
    skip-gram symmetry: each occurrence is a center once)."""
    a = walks.select(
        F.col("start_node").alias("sn"), F.col("walk").alias("wk"),
        F.col("step").alias("step_a"), F.col("node").alias("center"),
    )
    b = walks.select(
        F.col("start_node").alias("sn"), F.col("walk").alias("wk"),
        F.col("step").alias("step_b"), F.col("node").alias("context"),
    )
    return (
        a.join(b, ["sn", "wk"])
        .filter(
            (F.col("step_a") != F.col("step_b"))
            & (F.abs(F.col("step_a") - F.col("step_b")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count("*").cast("long").alias("n"))
    )


def skipgram_oracle_sql(
    edges_sql: str,
    window: int = 2,
    walk_len: int = 4,
    walks_per_node: int = 2,
    seed: str = "w0",
) -> str:
    """DuckDB mirror: the walks oracle as a materialized CTE, the same
    banded self-join, the same symmetric count."""
    walks_sql = walks_oracle_sql(
        edges_sql, walk_len=walk_len, walks_per_node=walks_per_node,
        seed=seed,
    )
    return f"""
    WITH w AS MATERIALIZED ({walks_sql})
    SELECT a.node AS center, b.node AS context,
           CAST(count(*) AS BIGINT) AS n
    FROM w a JOIN w b
      ON a.start_node = b.start_node AND a.walk = b.walk
    WHERE a.step <> b.step AND abs(a.step - b.step) <= {window}
    GROUP BY a.node, b.node
    """
