"""Triangle / Jaccard gates: planted graphs with hand-checked answers, a
brute-force python cross-check on a seeded random graph, and the
hub-exclusion contract of the Jaccard wedge."""

import itertools
import random

import pyspark.sql.functions as F

import math

from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py
from augmented_codebase_indexer_spark.operators.graphalgs import (
    adamic_adar,
    jaccard_similarity,
    k_core,
    triangle_counts,
    undirected_edges,
)


def _df(spark, edges):
    return spark.createDataFrame(edges, ["src", "dst"])


def test_k4_triangles(spark):
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(_df(spark, k4)).collect()}
    # K4 has 4 triangles; each node sits in C(3,2)=3 of them
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_path_has_no_triangles(spark):
    assert triangle_counts(_df(spark, [("a", "b"), ("b", "c"), ("c", "d")])).count() == 0


def test_messy_input_canonicalized(spark):
    """Self-loops, duplicates, and reversed duplicates must not create or
    multiply triangles."""
    messy = [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("c", "b"),
             ("a", "c"), ("a", "c")]
    und = undirected_edges(_df(spark, messy))
    assert sorted(tuple(r) for r in und.collect()) == [("a", "b"), ("a", "c"), ("b", "c")]
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(_df(spark, messy)).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def _py_triangles(edges):
    und = set()
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        und.add((a, b))
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts, adj


def test_random_graph_matches_bruteforce(spark):
    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(30)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    want, adj = _py_triangles(edges)
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(_df(spark, edges)).collect()}
    assert got == want

    jac = jaccard_similarity(_df(spark, edges), min_common=1).collect()
    for r in jac:
        common = adj[r["a"]] & adj[r["b"]]
        union = adj[r["a"]] | adj[r["b"]]
        assert r["n_common"] == len(common)
        assert r["deg_a"] == len(adj[r["a"]])
        assert r["deg_b"] == len(adj[r["b"]])
        assert r["jaccard_micro"] == (len(common) * 1_000_000) // len(union)
    # every qualifying pair is present
    want_pairs = {
        (a, b)
        for a, b in itertools.combinations(sorted(adj), 2)
        if adj[a] & adj[b]
    }
    assert {(r["a"], r["b"]) for r in jac} == want_pairs


def test_jaccard_square_plus_diagonal(spark):
    sq = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    got = {(r["a"], r["b"]): r for r in jaccard_similarity(_df(spark, sq)).collect()}
    # b and d: N(b)={a,c}=N(d) → jaccard 1.0
    assert got[("b", "d")]["jaccard_micro"] == 1_000_000
    # a and c: N(a)={b,c,d}, N(c)={a,b,d} → common {b,d}, union {a,b,c,d}
    assert got[("a", "c")]["n_common"] == 2
    assert got[("a", "c")]["jaccard_micro"] == 500_000


def test_adamic_adar_matches_bruteforce(spark):
    rng = random.Random(11)
    nodes = [f"n{i:02d}" for i in range(25)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    _, adj = _py_triangles(edges)
    got = {(r["a"], r["b"]): r for r in adamic_adar(_df(spark, edges)).collect()}
    want_pairs = set()
    for a, b in itertools.combinations(sorted(adj), 2):
        common = adj[a] & adj[b]
        if not common:
            continue
        want_pairs.add((a, b))
        # r6: per-degree weight via the libm-free integer log
        def _w(deg):
            lnm = ln_micro_py(deg, 1)
            return (10**12 + lnm // 2) // lnm

        micro = sum(_w(len(adj[n])) for n in common)
        r = got[(a, b)]
        assert r["aa_micro"] == micro  # exact integer parity
        assert r["n_common"] == len(common)
    assert set(got) == want_pairs
    # rare shared neighbors outrank hubs: a pair sharing one degree-2
    # neighbor scores above a pair sharing one higher-degree neighbor
    # (checked implicitly by the exact parity above)


def _py_kcore(edges, k):
    _, adj = _py_triangles(edges)
    adj = {n: set(xs) for n, xs in adj.items()}
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(xs) for n, xs in adj.items()}


def test_kcore_cascading_peel(spark):
    """A chain hung off a triangle peels node-by-node: each removal drops
    the next node below k=2 — the deep-peel case the unrolled oracle must
    also converge on."""
    g = [("a", "b"), ("b", "c"), ("c", "a"),  # the 2-core
         ("c", "d"), ("d", "e"), ("e", "f")]  # cascading tail
    got = {r["node"]: r["core_deg"] for r in k_core(_df(spark, g), k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_empty_when_k_too_high(spark):
    g = [("a", "b"), ("b", "c"), ("c", "a")]
    assert k_core(_df(spark, g), k=3).count() == 0


def test_kcore_raises_when_peel_depth_exceeds_iters(spark):
    """max_iters exhaustion must raise, not return the superset of the
    core a partially-peeled graph implies."""
    import pytest as _pytest

    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        k_core(_df(spark, chain), k=2, max_iters=2)  # chain peels in ~5


def test_kcore_matches_bruteforce(spark):
    rng = random.Random(13)
    nodes = [f"n{i:02d}" for i in range(30)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(140)]
    for k in (2, 4, 6):
        want = _py_kcore(edges, k)
        got = {r["node"]: r["core_deg"]
               for r in k_core(_df(spark, edges), k=k).collect()}
        assert got == want, f"k={k}"


def test_jaccard_hub_cap_excludes_center(spark):
    """A hub above max_degree must not generate pairs as a wedge center,
    but still counts in the true degrees of its neighbors."""
    star = [("hub", f"x{i}") for i in range(5)] + [("x0", "x1")]
    full = jaccard_similarity(_df(spark, star), min_common=1)
    assert full.filter((F.col("a") == "x2") & (F.col("b") == "x3")).count() == 1
    capped = jaccard_similarity(_df(spark, star), min_common=1, max_degree=3)
    rows = capped.collect()
    # pairs through the hub are gone; the x0-x1 edge still wedges via
    # hub-degree... no: x0,x1's only shared neighbor IS the hub → only
    # pairs with a sub-cap center survive: (hub, x1) via x0 and (hub, x0)
    # via x1 — and their deg columns keep the hub's true degree 5
    for r in rows:
        assert "hub" in (r["a"], r["b"])
        assert r["deg_a"] == 5 or r["deg_b"] == 5
    assert capped.filter((F.col("a") == "x2") & (F.col("b") == "x3")).count() == 0


class TestClusteringCoefficients:
    # a triangle a-b-c, a pendant d hanging off a, and an isolated edge
    EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("x", "y")]

    def _df(self, spark):
        return spark.createDataFrame(self.EDGES, "src string, dst string")

    def test_values(self, spark):
        from augmented_codebase_indexer_spark.operators.graphalgs import (
            clustering_coefficients,
        )

        got = {
            r["node"]: r
            for r in clustering_coefficients(self._df(spark)).collect()
        }
        # a: deg 3, 1 triangle → 2·1/(3·2) = 1/3
        assert (got["a"]["deg"], got["a"]["n_triangles"]) == (3, 1)
        assert got["a"]["cc_micro"] == 333333
        # b, c: deg 2, 1 triangle → fully clustered
        assert got["b"]["cc_micro"] == got["c"]["cc_micro"] == 1000000
        # pendant and isolated-edge nodes: deg 1 → 0 by convention
        assert got["d"]["cc_micro"] == 0 and got["x"]["cc_micro"] == 0
        assert got["d"]["n_triangles"] == 0

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from augmented_codebase_indexer_spark.operators.graphalgs import (
            clustering_coefficients,
            clustering_oracle_sql,
        )

        edges_sql = " UNION ALL ".join(
            f"SELECT '{a}' AS src, '{b}' AS dst" for a, b in self.EDGES
        )
        con = duckdb.connect()
        want = sorted(tuple(r) for r in con.execute(
            clustering_oracle_sql(edges_sql)).fetchall())
        got = sorted(
            tuple(r)
            for r in clustering_coefficients(self._df(spark)).collect()
        )
        assert got == want
