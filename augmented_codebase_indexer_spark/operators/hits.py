"""HITS hubs & authorities (Kleinberg, JACM'99 "Authoritative sources in
a hyperlinked environment") — the second classic link-analysis family
next to PageRank: authorities are pointed at by good hubs, hubs point
at good authorities. On a web KG the authority axis ranks entity pages,
the hub axis ranks directory/listing pages — PageRank conflates both.

Exact-integer form (the repo's oracle discipline): scores live in micro
units, and each half-step renormalizes by the MAXIMUM raw score —
``x' = (x_raw · 1e6) DIV max(x_raw)`` — the max-norm variant of HITS
(standard in practice; L2 needs a sqrt no integer gate can mirror).
Fixed ``rounds`` (power iteration saturates geometrically; rounds is a
parameter, not a convergence loop). Overflow bound: scores ≤ 1e6,
so raw sums ≤ 1e6·max_degree and the scaled product ≤ 1e12·max_degree
— inside BIGINT for any graph with max degree < ~9·10^5; beyond that,
pre-divide (documented, not silently wrong).

Scale shape: each half-step is ONE equi-join of the slim (node, score)
relation against the edge list (both node-keyed — co-located under
node bucketing) + one map-side-combinable sum + a 1-row max broadcast.
Dangling direction handled by construction: nodes with no in-edges get
authority 0, nodes with no out-edges get hub 0 (left join + coalesce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .guards import register_pin

_SCALE = 1_000_000

# Score/raw frames are (node, long) rows; below this node count they are
# broadcast into the half-step joins, above it the planner falls back to
# shuffled joins from real sizes. Same cap-and-degrade discipline as
# guards.guarded_broadcast, but the count is taken ONCE on the pinned node
# set instead of per half-step.
BROADCAST_MAX_NODES = 1_000_000


def hits_scores(
    edges: DataFrame, rounds: int = 3, src: str = "src", dst: str = "dst",
    broadcast_max_nodes: int = BROADCAST_MAX_NODES,
) -> DataFrame:
    """→ (node, hub_micro, auth_micro) after ``rounds`` full
    (authority, hub) updates over the DISTINCT directed edge set
    (self-loops dropped); both scores max-normalized to [0, 1e6].

    r7 shape: the distinct edge set and node set are localCheckpoint-pinned
    once (previously every one of the 2·rounds half-steps re-derived both
    from scratch — 6 redundant distinct exchanges at rounds=3), each
    half-step's raw propagation is pinned before the max/renormalize fan-out
    (it is consumed twice), and the slim (node, score) relations are
    broadcast into the edge join below ``broadcast_max_nodes`` so a
    half-step shuffles nothing but the map-side-combined sums. All-integer
    arithmetic, so the restructure is exactly result-preserving."""
    if not 1 <= rounds <= 16:
        raise ValueError("hits_scores: rounds must be in [1, 16]")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = register_pin(e.localCheckpoint(eager=True))
    nodes = register_pin(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    small = nodes.count() <= broadcast_max_nodes

    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    hub = nodes.select("node", F.lit(_SCALE).cast("long").alias("s"))

    def _half(scores: DataFrame, key_in: str, key_out: str) -> DataFrame:
        # propagate scores across edges key_in → key_out, renormalize
        raw = (
            e.join(_b(scores.withColumnRenamed("node", key_in)), key_in)
            .groupBy(F.col(key_out).alias("node"))
            .agg(F.sum("s").cast("long").alias("raw"))
        )
        # raw feeds BOTH the max aggregate and the renormalize join — pin it
        # so the propagation (and the whole upstream half-step chain) is not
        # recomputed per consumer
        raw = register_pin(raw.localCheckpoint(eager=True))
        mx = raw.agg(
            F.greatest(F.max("raw"), F.lit(1)).cast("long").alias("mx")
        )
        return (
            nodes.join(_b(raw), "node", "left")
            .crossJoin(F.broadcast(mx))
            .selectExpr(
                "node",
                f"(coalesce(raw, 0) * {_SCALE}) DIV mx AS s",
            )
        )

    auth = hub  # placeholder; first half-step overwrites
    for _ in range(rounds):
        auth = _half(hub, "src", "dst")
        hub = _half(auth, "dst", "src")
    return (
        hub.withColumnRenamed("s", "hub_micro")
        .join(_b(auth.withColumnRenamed("s", "auth_micro")), "node")
        .select("node", "hub_micro", "auth_micro")
    )


def hits_oracle_sql(edges_sql: str, rounds: int = 3) -> str:
    """DuckDB mirror: same distinct edge set, same max-norm half-steps,
    unrolled one CTE trio per half-step."""
    parts = [
        f"""WITH raw AS ({edges_sql}),
    e AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
    nodes AS MATERIALIZED (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    h0 AS (SELECT node, CAST({_SCALE} AS BIGINT) AS s FROM nodes)"""
    ]
    prev_h = "h0"
    for r in range(1, rounds + 1):
        parts.append(
            f"""ar{r} AS (
      SELECT e.dst AS node, CAST(sum(h.s) AS BIGINT) AS raw
      FROM e JOIN {prev_h} h ON e.src = h.node GROUP BY e.dst),
    am{r} AS (SELECT greatest(max(raw), 1) AS mx FROM ar{r}),
    a{r} AS (
      SELECT n.node, (coalesce(ar.raw, 0) * {_SCALE}) // am{r}.mx AS s
      FROM nodes n LEFT JOIN ar{r} ar ON n.node = ar.node
      CROSS JOIN am{r}),
    hr{r} AS (
      SELECT e.src AS node, CAST(sum(a.s) AS BIGINT) AS raw
      FROM e JOIN a{r} a ON e.dst = a.node GROUP BY e.src),
    hm{r} AS (SELECT greatest(max(raw), 1) AS mx FROM hr{r}),
    h{r} AS (
      SELECT n.node, (coalesce(hr.raw, 0) * {_SCALE}) // hm{r}.mx AS s
      FROM nodes n LEFT JOIN hr{r} hr ON n.node = hr.node
      CROSS JOIN hm{r})"""
        )
        prev_h = f"h{r}"
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT h.node, h.s AS hub_micro, a.s AS auth_micro
    FROM h{rounds} h JOIN a{rounds} a ON h.node = a.node
    """
    )


def hits_py(
    edges: list[tuple[str, str]], rounds: int = 3
) -> list[tuple[str, int, int]]:
    """Pure-python mirror for tests: [(node, hub_micro, auth_micro)]."""
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({n for ab in e for n in ab})
    hub = {n: _SCALE for n in nodes}
    auth = {}
    for _ in range(rounds):
        raw = {n: 0 for n in nodes}
        for a, b in e:
            raw[b] += hub[a]
        mx = max(max(raw.values()), 1)
        auth = {n: (raw[n] * _SCALE) // mx for n in nodes}
        raw = {n: 0 for n in nodes}
        for a, b in e:
            raw[a] += auth[b]
        mx = max(max(raw.values()), 1)
        hub = {n: (raw[n] * _SCALE) // mx for n in nodes}
    return [(n, hub[n], auth[n]) for n in nodes]
