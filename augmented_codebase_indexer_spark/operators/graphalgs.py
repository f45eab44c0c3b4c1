"""Entity-graph analytics: triangle counting and neighborhood Jaccard
similarity — the local-structure measures a KG pipeline uses to validate
entity resolution (over-merged nodes collapse triangles; duplicate
entities show near-identical neighborhoods).

Complements the existing global measures (`pagerank.py`,
`components.py`, `traversal.py`); the reference's graph surface exposes
neighbor expansion (`src/aci/services/graph_service.py:204-240`) but no
local clustering — these are the standard additions from the public
literature.

Scale shapes:

* **Triangles** use the degree-ordering MR algorithm (Suri &
  Vassilvitskii, WWW'11 "Counting triangles and the curse of the last
  reducer"): orient every undirected edge from its (degree, id)-smaller
  endpoint to the larger, so each node's out-degree is O(√m) and the
  wedge self-join never explodes on hubs — the naive per-node join is
  Θ(deg²) on exactly the celebrity entities a web KG has. Three joins,
  all on fixed-width node ids.
* **Jaccard** wedges through the shared-neighbor node; its fan-out IS
  Θ(deg²) on the wedge center, so hubs are excluded by ``max_degree``
  (the published mitigation — a neighbor shared with everyone carries no
  similarity signal anyway, same reason `mentions_joins.py` prunes by
  document frequency). The cap is an EXPLICIT caller parameter (default
  off), and pair degrees in the output always report true full-graph
  values, so a capped run is visibly capped; callers auditing the cut
  count hubs directly from the degree frame
  (``deg.filter(deg > max_degree)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.intlog import duckdb_ln_micro_sql, with_ln_micro


def undirected_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical undirected simple edges: (a < b), self-loops dropped,
    duplicates and reverse duplicates collapsed."""
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    return (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts: (node, n_triangles).

    Degree-ordered orientation: edge (u, v) points u→v iff
    (deg(u), u) < (deg(v), v) — a total order, so every triangle is
    enumerated exactly once as u→v1, u→v2, v1→v2 with v1 below v2.
    Nodes in no triangle are absent (left-join degrees back if needed).
    """
    und = undirected_edges(edges, src, dst)
    deg = _degrees(und)
    # orient by (deg, id): out-degree becomes O(sqrt(m)) per node
    withdeg = (
        und.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "deg_a"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b"), "b")
    )
    fwd = F.struct(F.col("deg_a"), F.col("a")) < F.struct(F.col("deg_b"), F.col("b"))
    oriented = withdeg.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_v"),
    )
    e1 = oriented.select("u", F.col("v").alias("v1"), F.col("deg_v").alias("dv1"))
    e2 = oriented.select("u", F.col("v").alias("v2"), F.col("deg_v").alias("dv2"))
    wedges = e1.join(e2, "u").filter(
        F.struct(F.col("dv1"), F.col("v1")) < F.struct(F.col("dv2"), F.col("v2"))
    )
    closing = oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tris = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    # one narrow explode over the triangle list — a union of three selects
    # would re-evaluate the whole wedge join per branch
    corners = tris.select(
        F.explode(F.array("u", "v1", "v2")).alias("node")
    )
    return corners.groupBy("node").agg(F.count("*").cast("long").alias("n_triangles"))


def jaccard_similarity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """Neighborhood Jaccard for node pairs sharing ≥ ``min_common``
    neighbors: (a, b, n_common, deg_a, deg_b, jaccard_micro) with a < b
    and jaccard_micro = (|N(a)∩N(b)| * 1e6) DIV |N(a)∪N(b)| — truncating
    BIGINT division on positive integers, exact and identical in Spark
    ``DIV`` and DuckDB ``//`` (a ``round(float, 6)`` here is the
    half-way-tie hazard that made lm_quality's r4 driver row red:
    n_common/union is a small-denominator rational, so exact 6-dp ties
    occur and resolve ulp-dependently across engine builds). Display
    jaccard = jaccard_micro / 1e6.

    ``max_degree`` drops wedge CENTERS above the cap before the Θ(deg²)
    fan-out (hub mitigation); pair degrees in the output are still the
    true full-graph degrees, so the score is only ever under-counted via
    n_common for capped hub co-neighbors — documented, not silent:
    callers can count excluded hubs from the degree frame.
    """
    und = undirected_edges(edges, src, dst)
    deg = _degrees(und)
    adj = und.select(F.col("a").alias("n"), F.col("b").alias("x")).unionAll(
        und.select(F.col("b").alias("n"), F.col("a").alias("x"))
    )
    if max_degree is not None:
        centers = deg.filter(F.col("deg") <= max_degree).select(
            F.col("node").alias("n")
        )
        adj = adj.join(centers, "n")
    p1 = adj.select("n", F.col("x").alias("pa"))
    p2 = adj.select("n", F.col("x").alias("pb"))
    pairs = (
        p1.join(p2, "n")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .agg(F.count("*").cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    out = (
        pairs.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "deg_a"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b"), "b")
    )
    return out.select(
        "a", "b", "n_common", "deg_a", "deg_b",
        F.expr("(n_common * 1000000) DIV (deg_a + deg_b - n_common)").alias(
            "jaccard_micro"
        ),
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """Adamic-Adar link prediction: for node pairs sharing neighbors,
    score = Σ over shared neighbors n of 1/ln(deg(n)) — rare shared
    neighbors count more than hubs. The classic KG missing-edge ranker
    (Adamic & Adar 2003, public).

    Returns (a, b, n_common, aa_micro) with a < b. Following the repo's
    cross-engine exactness discipline, each center's weight is quantized
    ONCE to micro units per node — since r6 as the LIBM-FREE
    ``w_micro = round(1e12 / ln_micro(deg))`` with ``ln_micro`` the
    fixed-point BIGINT log (``functions/intlog.py``; rounding is the
    integer ``(1e12 + lnm DIV 2) DIV lnm``, identical in both engines by
    construction, so no libm build can flip a weight) — and ``aa_micro``
    is an exact integer sum; display score = aa_micro / 1e6.
    A shared neighbor always has deg ≥ 2, so ln(deg) > 0. ``max_degree``
    caps wedge centers exactly as in :func:`jaccard_similarity` (hubs
    carry ~no signal and cost Θ(deg²)).
    """
    und = undirected_edges(edges, src, dst)
    deg = _degrees(und)
    w = with_ln_micro(
        deg.select(F.col("node").alias("n"), "deg"), "deg", "1", "_lnm"
    ).select(
        "n",
        F.expr("(1000000000000 + _lnm DIV 2) DIV _lnm").alias("w_micro"),
        "deg",
    )
    if max_degree is not None:
        w = w.filter(F.col("deg") <= max_degree)
    adj = und.select(F.col("a").alias("n"), F.col("b").alias("x")).unionAll(
        und.select(F.col("b").alias("n"), F.col("a").alias("x"))
    )
    centers = adj.join(w.select("n", "w_micro"), "n")
    p1 = centers.select("n", "w_micro", F.col("x").alias("pa"))
    p2 = centers.select("n", F.col("x").alias("pb"))
    return (
        p1.join(p2, "n")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum("w_micro").cast("long").alias("aa_micro"),
        )
        .filter(F.col("n_common") >= min_common)
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """The k-core: the maximal subgraph where every node has degree ≥ k —
    the standard dense-backbone extraction for a noisy web KG (peripheral
    one-off entities peel away, the reliable core remains).

    Iterative peeling: drop nodes with current degree < k, recompute,
    repeat to fixpoint. The k-core is a UNIQUE fixpoint (peeling is
    confluent — order and batching don't matter), which is what makes an
    independently-iterated oracle exact. Each round is one degree
    aggregation + two semi-joins on node ids; lineage is cut per round
    with localCheckpoint and the loop exits on the first round that
    removes nothing (edge count stable). Rounds needed ≈ peel depth of
    the graph (small in practice); each round's exchanges carry node ids
    and counts only. Returns (node, core_deg) for k-core members.
    """
    cur = undirected_edges(edges, src, dst).localCheckpoint(eager=True)
    n_edges = cur.count()
    converged = n_edges == 0
    for _ in range(max_iters):
        if n_edges == 0:
            converged = True
            break
        deg = _degrees(cur)
        keep = deg.filter(F.col("deg") >= k).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        cur = nxt
        if n_next == n_edges:  # fixpoint: nothing peeled this round
            converged = True
            break
        n_edges = n_next
    if not converged:
        # a partially-peeled graph would silently report a SUPERSET of the
        # k-core (nodes whose support peels in later rounds) — raise, the
        # repo's counted-not-silent discipline
        raise RuntimeError(
            f"k_core: no fixpoint after {max_iters} rounds (peel depth "
            "exceeds max_iters) — raise max_iters"
        )
    return _degrees(cur).filter(F.col("deg") >= k).select(
        "node", F.col("deg").alias("core_deg")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors
# ---------------------------------------------------------------------------

def _und_ctes(edges_sql: str) -> str:
    return f"""
    WITH raw AS ({edges_sql}),
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM raw WHERE src <> dst),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und)
      GROUP BY node)"""


def triangle_oracle_sql(edges_sql: str) -> str:
    """Independent formulation: closes wedges over the CANONICAL a<b edge
    list directly (id order, no degree orientation) — same triangles, so
    it cross-checks the degree-ordered enumeration, not just re-runs it."""
    return _und_ctes(edges_sql) + """,
    tris AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
    corners AS (
      SELECT x AS node FROM tris
      UNION ALL SELECT y FROM tris
      UNION ALL SELECT z FROM tris)
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node
    """


def adamic_adar_oracle_sql(edges_sql: str, min_common: int = 1) -> str:
    return _und_ctes(edges_sql) + f""",
    w AS (
      SELECT n, (1000000000000 + _lnm // 2) // _lnm AS w_micro
      FROM ({duckdb_ln_micro_sql("SELECT node AS n, deg FROM deg",
                                 "deg", "1", "_lnm", keep_cols="n, deg")})),
    adj AS (
      SELECT a AS n, b AS x FROM und UNION ALL SELECT b, a FROM und),
    centers AS (SELECT adj.n, w.w_micro, adj.x FROM adj JOIN w ON w.n = adj.n)
    SELECT p1.x AS a, p2.x AS b,
           CAST(count(*) AS BIGINT) AS n_common,
           CAST(sum(p1.w_micro) AS BIGINT) AS aa_micro
    FROM centers p1 JOIN centers p2 ON p1.n = p2.n AND p1.x < p2.x
    GROUP BY p1.x, p2.x
    HAVING count(*) >= {min_common}
    """


def k_core_oracle_sql(edges_sql: str, k: int, rounds: int = 20) -> str:
    """Unrolled peeling: ``rounds`` fixed rounds of drop-degree-<k. The
    k-core is a unique fixpoint and extra rounds are no-ops, so this
    matches the convergence-driven Spark loop exactly provided the graph
    peels within ``rounds`` (20 covers any graph whose peel depth is
    < 20 — planted tests cover the deep-peel case explicitly)."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs at every
    # reference, and each round references the previous ~3×, so 20
    # unrolled rounds would inline 3^20 scans of the base table
    parts = [_und_ctes(edges_sql), ",\n    e0 AS MATERIALIZED (SELECT a, b FROM und)"]
    for i in range(rounds):
        parts.append(f""",
    k{i} AS MATERIALIZED (
      SELECT node FROM (
        SELECT node, count(*) AS c FROM (
          SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i})
        GROUP BY node)
      WHERE c >= {k}),
    e{i + 1} AS MATERIALIZED (
      SELECT e{i}.a, e{i}.b FROM e{i}
      JOIN k{i} x ON x.node = e{i}.a
      JOIN k{i} y ON y.node = e{i}.b)""")
    parts.append(f"""
    SELECT node, CAST(count(*) AS BIGINT) AS core_deg FROM (
      SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
    GROUP BY node HAVING count(*) >= {k}
    """)
    return "".join(parts)


def jaccard_oracle_sql(edges_sql: str, min_common: int = 1) -> str:
    return _und_ctes(edges_sql) + f""",
    adj AS (
      SELECT a AS n, b AS x FROM und UNION ALL SELECT b, a FROM und),
    pairs AS (
      SELECT p1.x AS a, p2.x AS b, CAST(count(*) AS BIGINT) AS n_common
      FROM adj p1 JOIN adj p2 ON p1.n = p2.n AND p1.x < p2.x
      GROUP BY p1.x, p2.x
      HAVING count(*) >= {min_common})
    SELECT pairs.a, pairs.b, n_common, da.deg AS deg_a, db.deg AS deg_b,
           CAST((n_common * 1000000) // (da.deg + db.deg - n_common) AS BIGINT)
             AS jaccard_micro
    FROM pairs
    JOIN deg da ON da.node = pairs.a
    JOIN deg db ON db.node = pairs.b
    """


def reciprocity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node edge reciprocity on a DIRECTED graph (Newman, "Networks"
    §7.10; Garlaschelli & Loffredo PRL'04): of a node's distinct
    out-edges, the share whose reverse edge also exists — mutual linking
    separates genuine relationships from drive-by references in a web
    link graph. Self-loops are excluded (reciprocity over them is
    vacuous). → (node, n_out, n_recip, reciprocity_micro), all BIGINT.

    Shape: distinct edge set, ONE self equi-join on the reversed pair
    (left_semi — only the slim (src, dst) ids move), two algebraic
    groupBys."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = e.join(rev, ["src", "dst"], "left_semi")
    n_out = e.groupBy("src").agg(F.count("*").cast("long").alias("n_out"))
    n_rec = mutual.groupBy("src").agg(F.count("*").cast("long").alias("n_recip"))
    return (
        n_out.join(n_rec, "src", "left")
        .select(
            F.col("src").alias("node"),
            "n_out",
            F.coalesce("n_recip", F.lit(0)).cast("long").alias("n_recip"),
            F.expr("coalesce(n_recip, 0) * 1000000 DIV n_out")
            .alias("reciprocity_micro"),
        )
    )


def reciprocity_oracle_sql(edges_sql: str) -> str:
    """DuckDB mirror of :func:`reciprocity`."""
    return f"""
    WITH e AS (
      SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst),
    mutual AS (
      SELECT e.src, e.dst FROM e
      JOIN e r ON r.src = e.dst AND r.dst = e.src),
    n_out AS (SELECT src, CAST(count(*) AS BIGINT) AS n_out FROM e GROUP BY src),
    n_rec AS (SELECT src, CAST(count(*) AS BIGINT) AS n_recip
              FROM mutual GROUP BY src)
    SELECT o.src AS node, o.n_out,
           CAST(coalesce(r.n_recip, 0) AS BIGINT) AS n_recip,
           CAST((coalesce(r.n_recip, 0) * 1000000) // o.n_out AS BIGINT)
             AS reciprocity_micro
    FROM n_out o LEFT JOIN n_rec r ON r.src = o.src
    """


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """→ (node, deg, n_triangles, cc_micro): Watts-Strogatz LOCAL
    clustering coefficient per node — 2·triangles / (deg·(deg−1)) in
    exact micro units via one truncating division; deg < 2 → 0 (the
    convention that keeps leaves comparable instead of NULL). The web-
    graph "how clique-ish is this entity's neighborhood" statistic:
    over-merged entities (two people fused into one node) show up as
    high-degree LOW-cc outliers, so this is the canonicalization-QA
    companion to the triangle count it composes.

    Scale: the triangle side is the degree-oriented wedge join above
    (Σ out-deg² with out-deg O(√m) — the Suri-Vassilvitskii bound);
    degrees and the final arithmetic are one map-side-combinable
    groupBy + a node-keyed left join. Nothing new shuffles."""
    und = undirected_edges(edges, src, dst)
    deg = _degrees(und)
    tri = triangle_counts(und.select(
        F.col("a").alias("src"), F.col("b").alias("dst")))
    return (
        deg.join(tri, "node", "left")
        .selectExpr(
            "node", "deg",
            "coalesce(n_triangles, CAST(0 AS BIGINT)) AS n_triangles",
        )
        .selectExpr(
            "node", "deg", "n_triangles",
            "CASE WHEN deg < 2 THEN CAST(0 AS BIGINT) "
            "ELSE (2 * n_triangles * 1000000) DIV (deg * (deg - 1)) "
            "END AS cc_micro",
        )
    )


def clustering_oracle_sql(edges_sql: str) -> str:
    """DuckDB mirror: the id-ordered triangle closure (the independent
    formulation above) joined to degrees, same guarded division."""
    return _und_ctes(edges_sql) + """,
    tris AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
    corners AS (
      SELECT x AS node FROM tris
      UNION ALL SELECT y FROM tris
      UNION ALL SELECT z FROM tris),
    tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
           FROM corners GROUP BY node)
    SELECT d.node, d.deg,
           CAST(coalesce(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.deg < 2 THEN CAST(0 AS BIGINT)
                ELSE (2 * coalesce(tc.n_triangles, 0) * 1000000)
                     // (d.deg * (d.deg - 1)) END AS cc_micro
    FROM deg d LEFT JOIN tc ON d.node = tc.node
    """


def assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman PRL 89:208701 (2002),
    eq. 4) over the canonical undirected simple graph — ONE row:
    (m_edges, s_jk, s_sum, s_sq, assortativity_micro).

    With per-edge endpoint degrees (j, k) and M edges, Newman's r is
    a Pearson correlation; clearing denominators gives the exact
    integer form

        num = 4M·Σjk − (Σ(j+k))²      den = 2M·Σ(j²+k²) − (Σ(j+k))²
        r_micro = num · 1e6 DIV den   (truncating toward zero — both
                                       engines identical on negatives)

    so the gate is BIGINT end-to-end; a REGULAR graph has den = 0
    (r undefined) → NULL, never a division error. Moment sums are
    reported raw so the micro ratio is auditable. Overflow bound:
    4M²D² must stay under 2^63 → M·D ≤ ~1.5·10^9 per partition-free
    global fold; beyond that, fold the moments per bucket first (they
    are plain sums — algebraic, map-side combinable).

    Social/citation webs are assortative (hubs link hubs, r > 0);
    mirror/spam farms are strongly disassortative star fields — the
    one-number screen on a crawled host graph.

    Scale shape: degrees via one node-grain aggregate, joined back to
    edges slim (two id-keyed joins), then a single global algebraic
    fold. No window, no pair materialization."""
    und = undirected_edges(edges)
    deg = _degrees(und)
    j = und.join(deg.select(F.col("node").alias("a"),
                            F.col("deg").alias("j")), "a")
    jk = j.join(deg.select(F.col("node").alias("b"),
                           F.col("deg").alias("k")), "b")
    mom = jk.agg(
        F.count("*").cast("long").alias("m_edges"),
        F.sum(F.expr("j * k")).cast("long").alias("s_jk"),
        F.sum(F.expr("j + k")).cast("long").alias("s_sum"),
        F.sum(F.expr("j * j + k * k")).cast("long").alias("s_sq"),
    )
    return mom.selectExpr(
        "m_edges", "s_jk", "s_sum", "s_sq",
        "CASE WHEN 2 * m_edges * s_sq - s_sum * s_sum = 0 THEN NULL"
        " ELSE (4 * m_edges * s_jk - s_sum * s_sum) * 1000000"
        " DIV (2 * m_edges * s_sq - s_sum * s_sum)"
        " END AS assortativity_micro",
    )


def assortativity_oracle_sql(edges_sql: str) -> str:
    """DuckDB mirror of :func:`assortativity`."""
    return _und_ctes(edges_sql) + """,
    jk AS (
      SELECT da.deg AS j, db.deg AS k
      FROM und e JOIN deg da ON e.a = da.node
                 JOIN deg db ON e.b = db.node),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS m_edges,
             CAST(sum(j * k) AS BIGINT) AS s_jk,
             CAST(sum(j + k) AS BIGINT) AS s_sum,
             CAST(sum(j * j + k * k) AS BIGINT) AS s_sq
      FROM jk)
    SELECT m_edges, s_jk, s_sum, s_sq,
           CASE WHEN 2 * m_edges * s_sq - s_sum * s_sum = 0 THEN NULL
                ELSE (4 * m_edges * s_jk - s_sum * s_sum) * 1000000
                     // (2 * m_edges * s_sq - s_sum * s_sum)
           END AS assortativity_micro
    FROM mom
    """


def k_truss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 30,
) -> DataFrame:
    """The k-truss: the maximal subgraph where every EDGE sits in
    ≥ k−2 triangles (Cohen, NSA TR'08) — the edge-grain tightening of
    the k-core (every k-truss is inside the (k−1)-core but prunes
    bridge edges the core keeps). On a web KG the truss is the
    relation backbone: an edge whose endpoints share no corroborating
    wedges is exactly the extraction-noise shape the core cannot see.

    Iterative peeling to the UNIQUE fixpoint (confluent, like the
    core): per round, per-edge support = common-neighbor count via the
    wedge join, drop edges below k−2, repeat until an iteration drops
    nothing; lineage cut per round with localCheckpoint, and a
    non-converged loop RAISES (a partial peel would silently report a
    superset — counted-not-silent discipline). Returns (a, b, support)
    with the FIXPOINT support. Requires k ≥ 3.

    Scale shape: each round is one wedge join (the Θ(deg²) cost rides
    the same degree-ordered mitigation argument as triangles — truss
    peeling at 10^11 edges is run per-community or behind a degree
    cap) + one (a, b) aggregate + one semi-join; exchanges carry node
    ids and counts only."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    cur = undirected_edges(edges, src, dst).localCheckpoint(eager=True)
    n_edges = cur.count()
    for _ in range(max_iters):
        if n_edges == 0:
            return cur.withColumn("support", F.lit(0).cast("long"))
        adj = cur.select(F.col("a").alias("n"), F.col("b").alias("x")).unionAll(
            cur.select(F.col("b").alias("n"), F.col("a").alias("x"))
        )
        sup = (
            cur.join(adj.select(F.col("n").alias("a"),
                                F.col("x").alias("xa")), "a")
            .join(adj.select(F.col("n").alias("b"),
                             F.col("x").alias("xa")), ["b", "xa"])
            .groupBy("a", "b")
            .agg(F.count("*").cast("long").alias("support"))
            .filter(F.col("support") >= k - 2)
            .localCheckpoint(eager=True)
        )
        n_next = sup.count()
        if n_next == n_edges:  # fixpoint: supports are final
            return sup.select("a", "b", "support")
        cur = sup.select("a", "b").localCheckpoint(eager=True)
        n_edges = n_next
    raise RuntimeError(
        f"k_truss did not converge within {max_iters} rounds")


def k_truss_oracle_sql(edges_sql: str, k: int, rounds: int = 20) -> str:
    """Unrolled peeling mirror (the k_core_oracle_sql precedent):
    ``rounds`` fixed rounds; the truss is a unique fixpoint so extra
    rounds are no-ops. MATERIALIZED is load-bearing — each round
    references its predecessor several times."""
    parts = [_und_ctes(edges_sql),
             ",\n    t0 AS MATERIALIZED (SELECT a, b FROM und)"]
    prev = "t0"
    for i in range(1, rounds + 1):
        parts.append(f""",
    adj{i} AS MATERIALIZED (
      SELECT a AS n, b AS x FROM {prev}
      UNION ALL SELECT b, a FROM {prev}),
    sup{i} AS MATERIALIZED (
      SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS support
      FROM {prev} e
      JOIN adj{i} p ON p.n = e.a
      JOIN adj{i} q ON q.n = e.b AND q.x = p.x
      GROUP BY e.a, e.b
      HAVING count(*) >= {k - 2}),
    t{i} AS MATERIALIZED (SELECT a, b FROM sup{i})""")
        prev = f"t{i}"
    parts.append(f"\n    SELECT a, b, support FROM sup{rounds}\n")
    return "".join(parts)


def attack_tolerance(edges: DataFrame, k: int = 10) -> DataFrame:
    """Hub-removal percolation (Albert, Jeong & Barabási, Nature 406
    (2000): scale-free graphs survive random failure but fragment
    under targeted hub ATTACK): remove the k highest-degree nodes
    (degree desc, id text tie-break — the selection is deterministic,
    so the gate covers the decision), re-run connected components over
    the survivors, and report the giant component's exact micro share.
    ONE row: (n_nodes, n_removed, n_survivors, max_component,
    giant_share_micro). Isolated survivors count as size-1 components
    in the denominator — never silently dropped. A share near 1e6
    means the graph's connectivity does not live on its hubs; a
    collapse is the mirror-farm / hub-spam signature.

    Scale shape: one degree aggregate + a k-row broadcast limit, two
    anti-joins, then the min-label CC machinery (O(diameter) rounds,
    lazy checkpoint blocks)."""
    from .components import connected_components

    und = undirected_edges(edges)
    deg = _degrees(und)
    hubs = deg.orderBy(F.desc("deg"), F.asc("node")).limit(k).select("node")
    nodes = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id"))).distinct()
    )
    survivors = nodes.join(
        hubs.select(F.col("node").alias("id")), "id", "left_anti")
    kept = (
        und.join(hubs.select(F.col("node").alias("a")), "a", "left_anti")
        .join(hubs.select(F.col("node").alias("b")), "b", "left_anti")
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    sizes = (
        connected_components(survivors, kept)
        .groupBy("component")
        .agg(F.count("*").cast("long").alias("size"))
    )
    n_all = nodes.agg(F.count("*").cast("long").alias("n_nodes"))
    n_sur = survivors.agg(F.count("*").cast("long").alias("n_survivors"))
    mx = sizes.agg(F.max("size").cast("long").alias("max_component"))
    return (
        n_all.crossJoin(n_sur).crossJoin(mx)  # 1-row frames
        .selectExpr(
            "n_nodes", f"CAST({k} AS BIGINT) AS n_removed",
            "n_survivors", "max_component",
            "max_component * 1000000 DIV n_survivors"
            " AS giant_share_micro",
        )
    )
