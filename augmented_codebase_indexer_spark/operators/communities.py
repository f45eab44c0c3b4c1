"""Label-propagation community detection (Raghavan-Albert-Kumara, Phys.
Rev. E 76 2007) — the near-linear-time community pass over the entity
co-occurrence graph, here in its DETERMINISTIC synchronous form: every
round, every node adopts the most frequent label among its neighbors,
ties broken by the lexicographically smallest label. The async original
is visit-order-dependent (useless under a parallelism-varying engine);
the sync + min-tie variant is a pure function of (graph, rounds), so it
gets the full cross-engine oracle gate.

Community structure complements the existing graph tier (connected
components find REACHABILITY clusters; LPA finds DENSITY clusters inside
one component — the "topic" granularity a KG browser actually wants).
Reference analog: the cluster view over linked entities
(`src/aci/services/graph_service.py` neighborhood queries).

Scale shape: one round = one equi-join (edges ⋈ labels, both keyed by
node — co-located under node bucketing) + one map-side-combinable
groupBy(node, label) + one argmax groupBy(node). Labels are a slim
(node, lbl) relation; edge text/payloads never enter the loop. Rounds
are FIXED (default 4 — LPA empirically saturates in ~5 rounds on
power-law graphs; r is a parameter, not a convergence loop, so the plan
is statically bounded and restartable per round). The argmax is
``min(struct(-cnt, lbl))`` — no per-node window, combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def lpa_communities(
    edges: DataFrame, rounds: int = 4, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """→ (node, community): synchronous LPA after ``rounds`` full-graph
    updates over the UNDIRECTED simple graph (edges symmetrized,
    self-loops and duplicates dropped). Initial label = the node id;
    each round every node takes its neighbors' modal label (tie → min
    label). Isolated nodes don't exist here (nodes are defined by the
    edge set)."""
    if not 1 <= rounds <= 16:
        raise ValueError("lpa_communities: rounds must be in [1, 16]")
    sym = _symmetrize(edges, src, dst)
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(rounds):
        votes = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"), "lbl")
            .agg(F.count("*").cast("long").alias("c"))
        )
        labels = (
            votes.groupBy("node")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), "lbl")).alias("w"))
            .select("node", F.col("w.lbl").alias("lbl"))
        )
    return labels.select("node", F.col("lbl").alias("community"))


def lpa_oracle_sql(edges_sql: str, rounds: int = 4) -> str:
    """DuckDB mirror: same symmetrization, same sync update, same
    (count desc, label asc) winner — unrolled one CTE pair per round."""
    parts = [
        f"""WITH raw AS ({edges_sql}),
    e AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)
      WHERE src <> dst),
    l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""c{r} AS (
      SELECT e.src AS node, l.lbl, CAST(count(*) AS BIGINT) AS c
      FROM e JOIN l{r - 1} l ON e.dst = l.node GROUP BY e.src, l.lbl),
    l{r} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl, row_number() OVER (
          PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
        FROM c{r}) WHERE rn = 1)"""
        )
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT node, lbl AS community FROM l{rounds}"
    )


def lpa_py(
    edges: list[tuple[str, str]], rounds: int = 4
) -> list[tuple[str, str]]:
    """Pure-python mirror for tests: [(node, community)]."""
    sym = {(a, b) for a, b in edges if a != b}
    sym |= {(b, a) for a, b in sym}
    nbrs: dict[str, list[str]] = {}
    for a, b in sym:
        nbrs.setdefault(a, []).append(b)
    lbl = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n, ns in nbrs.items():
            cnt: dict[str, int] = {}
            for m in ns:
                cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
            new[n] = min(cnt, key=lambda k: (-cnt[k], k))
        lbl = new
    return sorted(lbl.items())
