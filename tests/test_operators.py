"""Operator-level correctness vs independent pure-Python/numpy oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.functions.hashing import (
    hamming64,
    minhash16,
    minhash_est_jaccard,
    simhash60,
)
from augmented_codebase_indexer_spark.operators.ann import brute_force_topk
from augmented_codebase_indexer_spark.operators.dedup import (
    exact_duplicate_groups,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from augmented_codebase_indexer_spark.operators.pagerank import pagerank
from augmented_codebase_indexer_spark.operators.rrf import rank_by, rrf_fuse
from augmented_codebase_indexer_spark.operators.traversal import (
    neighborhood,
    topological_layers,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def edges_df(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    return e.select(
        F.col("user_id").cast("string").alias("subj_id"),
        ((F.col("user_id") * 3 + 7) % 50).cast("string").alias("obj_id"),
    ).distinct().cache()


def _edge_list(edges_df):
    return [(r["subj_id"], r["obj_id"]) for r in edges_df.collect()]


def test_pagerank_matches_numpy(spark, edges_df):
    """Inline numpy oracle with EXPLICIT dangling mass (sum over rank of
    out-degree-0 nodes) and the blocked stopping rule — independent of the
    operator's algebraically-equivalent dangling = 1 − Σcontribs form."""
    el = _edge_list(edges_df)
    nodes = sorted({x for e in el for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, d in el:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    damping = 0.85
    i = 0
    while i < 30:
        block = min(5, 30 - i)
        prev = r.copy()
        for _ in range(block):
            contrib = np.zeros(n)
            for s, d in el:
                contrib[idx[d]] += r[idx[s]] / out_deg[idx[s]]
            dangling = r[out_deg == 0].sum()
            r = (1 - damping) / n + damping * (contrib + dangling / n)
        i += block
        if np.abs(r - prev).sum() < 1e-6:
            break
    # local_threshold=0: gate the DISTRIBUTED loop against the inline oracle
    got = {row["node_id"]: row["pagerank"]
           for row in pagerank(edges_df, max_iters=30, local_threshold=0).collect()}
    assert set(got) == set(nodes)
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 1e-6, node
    # tier equivalence: the local solver (default tier at this size) agrees
    local = {row["node_id"]: row["pagerank"]
             for row in pagerank(edges_df, max_iters=30).collect()}
    for node in nodes:
        assert abs(local[node] - got[node]) < 1e-9, node


def test_ppr_matches_inline_oracle_and_concentrates(spark, edges_df):
    """Distributed PPR == inline numpy with EXPLICIT dangling mass
    teleported to the seeds; the local tier agrees; rank concentrates on
    the seed's neighborhood vs global pagerank; absent seeds are dropped
    with renormalization and an all-absent seed set raises."""
    from augmented_codebase_indexer_spark.operators.pagerank import (
        personalized_pagerank,
        ppr_numpy_mirror,
    )

    el = _edge_list(edges_df)
    nodes = sorted({x for e in el for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    seeds = [nodes[0]]
    out_deg = np.zeros(n)
    for s, d in el:
        out_deg[idx[s]] += 1
    reset = np.zeros(n)
    reset[idx[seeds[0]]] = 1.0
    damping = 0.85
    r = reset.copy()
    i = 0
    while i < 30:
        block = min(5, 30 - i)
        prev = r.copy()
        for _ in range(block):
            contrib = np.zeros(n)
            for s, d in el:
                contrib[idx[d]] += r[idx[s]] / out_deg[idx[s]]
            dangling = r[out_deg == 0].sum()  # explicit, not 1 - sum
            r = damping * contrib + ((1 - damping) + damping * dangling) * reset
        i += block
        if np.abs(r - prev).sum() < 1e-6:
            break

    got = {row["node_id"]: row["pagerank"]
           for row in personalized_pagerank(
               edges_df, seeds, max_iters=30, local_threshold=0).collect()}
    assert set(got) == set(nodes)
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 1e-6, node
    # local tier (numpy mirror) agrees with the distributed loop
    local = {row["node_id"]: row["pagerank"]
             for row in personalized_pagerank(edges_df, seeds, max_iters=30).collect()}
    for node in nodes:
        assert abs(local[node] - got[node]) < 1e-6, node
    # concentration: the seed holds more mass under PPR than under global
    pr = {row["node_id"]: row["pagerank"]
          for row in pagerank(edges_df, max_iters=30).collect()}
    assert got[seeds[0]] > pr[seeds[0]]
    # absent seeds: renormalized over the present ones == present-only run
    with_ghost = ppr_numpy_mirror(el, seeds + ["__not_a_node__"], max_iters=30)
    for node in nodes:
        assert abs(with_ghost[node] - local[node]) < 1e-12
    with pytest.raises(ValueError):
        ppr_numpy_mirror(el, ["__not_a_node__"], max_iters=30)


def test_neighborhood_matches_bfs(spark, edges_df):
    el = _edge_list(edges_df)
    adj = {}
    for s, d in el:
        adj.setdefault(s, set()).add(d)
    want = {"1": 0}
    frontier = {"1"}
    for depth in range(1, 4):
        frontier = {d for s in frontier for d in adj.get(s, ())} - set(want)
        for x in frontier:
            want[x] = depth
    got = {r["node_id"]: r["hops"] for r in neighborhood(edges_df, ["1"], depth=3).collect()}
    assert got == want


def test_topo_layers_matches_kahn(spark):
    rows = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("x", "y"), ("y", "x")]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    nodes = spark.createDataFrame([(n,) for n in "abcdexy"], ["node_id"])
    got = {r["node_id"]: r["layer"] for r in topological_layers(edges, nodes).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3, "x": -1, "y": -1}


def test_rrf_matches_formula(spark, docs):
    a = rank_by(docs.select("doc_id", F.col("n_chars").alias("s")), "doc_id", "s", "a")
    b = rank_by(
        docs.select("doc_id", ((F.col("doc_id") * 37) % 101).alias("s")), "doc_id", "s", "b"
    )
    got = {r["item_id"]: r["rrf_score"] for r in rrf_fuse([a, b]).collect()}
    rows = [(r["doc_id"], r["n_chars"]) for r in docs.collect()]
    ra = {d: i + 1 for i, (d, _) in enumerate(sorted(rows, key=lambda x: (-x[1], x[0])))}
    rb = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(((d, (d * 37) % 101) for d, _ in rows), key=lambda x: (-x[1], x[0]))
        )
    }
    for d in ra:
        want = round(1.0 / (60 + ra[d]) + 1.0 / (60 + rb[d]), 6)
        assert abs(got[d] - want) < 1e-9


def test_exact_dedup(spark, docs):
    d = docs.select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 10).select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    groups = exact_duplicate_groups(d.unionByName(dup)).collect()
    assert len(groups) == 10
    assert all(g["dup_count"] == 2 for g in groups)


def test_minhash_est_matches_pure_python(spark, docs):
    """Every reported estimate equals the pure-Python MinHash estimator on
    the same texts, and exact duplicates are always recalled (est = 1.0,
    identical signatures ⇒ every band collides)."""
    d = docs.select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text"
    )
    both = d.unionByName(dup)
    pairs = minhash_near_duplicates(both, threshold=0.5, max_bucket_size=None).collect()
    texts = {r["doc_id"]: r["text"] for r in both.collect()}
    sigs = {i: minhash16(t) for i, t in texts.items()}
    for p in pairs:
        want = round(minhash_est_jaccard(sigs[p["ida"]], sigs[p["idb"]]), 6)
        assert abs(p["est_jaccard"] - want) < 1e-9, (p, want)
    got = {(p["ida"], p["idb"]) for p in pairs}
    for i in range(20):
        assert (i, i + 20000) in got  # planted exact dups: recall 1
    # precision of the estimator gate: every reported pair shares >= 8/16
    # minima, i.e. genuinely high word-shingle overlap on this corpus
    assert all(p["est_jaccard"] >= 0.5 for p in pairs)


def test_simhash_pairs_verified(spark, docs):
    pairs = simhash_near_duplicates(docs, max_hamming=12).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for p in pairs:
        assert hamming64(simhash60(texts[p["ida"]]), simhash60(texts[p["idb"]])) == p["hamming"]
        assert p["hamming"] <= 12


def test_simhash_null_and_empty_text_excluded(spark):
    """Empty/null docs must NOT pair up as hamming-0 'duplicates' (ADVICE r1)."""
    rows = [(1, ""), (2, ""), (3, None), (4, "real text here about things"),
            (5, "real text here about things")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_near_duplicates(df, max_hamming=6).collect()
    assert {(p["ida"], p["idb"]) for p in pairs} == {(4, 5)}


def test_minhash_dropped_buckets_observable(spark, docs):
    from augmented_codebase_indexer_spark.operators.dedup import (
        minhash_near_duplicate_candidates,
        with_minhash_signature,
    )

    d = docs.select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 30000).alias("doc_id"), "text"
    )
    signed = with_minhash_signature(d.unionByName(dup).unionByName(
        dup.select((F.col("doc_id") + 30000).alias("doc_id"), "text")
    ))
    _, dropped = minhash_near_duplicate_candidates(signed, max_bucket_size=2)
    drops = dropped.collect()
    assert len(drops) > 0  # triplicate docs exceed the cap → visible, not silent
    assert all(r["bucket_size"] > 2 for r in drops)


def test_sql_sketches_match_pure_python(spark, docs):
    """The JVM expression sketches (sqlhash.py) equal the pure-Python
    mirrors row-for-row — the invariant that makes the DuckDB driver oracle
    for minhash/simhash/fingerprint a real gate."""
    from augmented_codebase_indexer_spark.functions.hashing import rolling_fingerprint
    from augmented_codebase_indexer_spark.functions.sqlhash import (
        fingerprint_expr,
        minhash_sig_expr,
        simhash60_expr,
    )

    sample = docs.filter(F.col("doc_id") < 50).select("doc_id", "text")
    rows = sample.select(
        "doc_id",
        F.expr(minhash_sig_expr("text")).alias("sig"),
        F.expr(simhash60_expr("text")).alias("sim"),
        F.expr(fingerprint_expr("text", "spark")).alias("fp"),
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in sample.collect()}
    for r in rows:
        t = texts[r["doc_id"]]
        assert list(r["sig"]) == minhash16(t)
        assert r["sim"] == simhash60(t)
        assert list(r["fp"]) == rolling_fingerprint(t)


def test_ngram_jaccard_exact(spark, docs):
    got = {
        (r["ida"], r["idb"]): r["jaccard_micro"]
        for r in ngram_jaccard_pairs(docs, 0.8).collect()
    }
    texts = {r["doc_id"]: set(r["text"].split(" ")) for r in docs.collect()}
    ids = sorted(texts)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(texts[a] & texts[b])
            union = len(texts[a] | texts[b])
            # integer cross-multiply gate + truncating micro score — the
            # exact arithmetic both engines run
            if inter * 1_000_000 >= 800_000 * union:
                want[(a, b)] = (inter * 1_000_000) // union
    assert got == want


def test_ann_topk_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = brute_force_topk(emb, [0, 1, 2], k=3).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    for q in (0, 1, 2):
        qv = vecs[q]
        sims = sorted(
            (
                (-round(float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), 6), i)
                for i, v in vecs.items()
                if i != q
            )
        )[:3]
        want = [(i, -s) for s, i in sims]
        rows = sorted(
            [(r["neighbor_id"], r["cosine"]) for r in got if r["query_id"] == q],
            key=lambda x: -x[1],
        )
        assert [w[0] for w in want] == [r[0] for r in rows]
        for (wi, ws), (ri, rs) in zip(want, rows):
            assert abs(ws - rs) < 1e-5


def test_ivf_topk_recall_and_score_correctness(spark):
    """IVF tier: returned cosines must equal the brute-force cosine for the
    same pair (the re-rank is exact), and recall@3 vs the brute tier must
    clear a floor appropriate to probing 4/16 lists."""
    from augmented_codebase_indexer_spark.operators.ann import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = list(range(10))
    brute = brute_force_topk(emb, qids, k=3).collect()
    ivf = ivf_topk(emb, qids, k=3, n_centroids=16, n_probe=4).collect()
    bcos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in brute}
    # exact re-rank: any pair IVF returns that brute also ranked must agree
    allpairs = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(emb, qids, k=500).collect()
    }
    for r in ivf:
        assert abs(allpairs[(r["query_id"], r["neighbor_id"])] - r["cosine"]) < 1e-9
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    want = set(bcos)
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall
    # determinism
    again = {(r["query_id"], r["neighbor_id"]) for r in
             ivf_topk(emb, qids, k=3, n_centroids=16, n_probe=4).collect()}
    assert again == got


def test_embedding_lsh_subset_of_exact(spark):
    from augmented_codebase_indexer_spark.operators.ann import (
        embedding_near_duplicates,
        embedding_near_duplicates_lsh,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {(r["ida"], r["idb"]) for r in embedding_near_duplicates(emb, 0.5).collect()}
    approx = {(r["ida"], r["idb"]) for r in embedding_near_duplicates_lsh(emb, 0.5).collect()}
    assert approx <= exact  # precision 1 (exact verify)
    if exact:
        assert len(approx) / len(exact) > 0  # nonzero recall when dups exist


def test_embedding_lsh_recall_on_planted_neardups(spark):
    """Recall gate (VERDICT r1 #3): planted near-dup vectors whose first-16
    sign pattern is preserved MUST be found — identical signatures collide
    in every band, so recall on them is deterministic, not probabilistic."""
    import numpy as np
    from augmented_codebase_indexer_spark.operators.ann import (
        embedding_near_duplicates,
        embedding_near_duplicates_lsh,
    )

    rng = np.random.RandomState(3)
    base = rng.standard_normal((40, 64)).astype("float32")
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # plant 5 near-dups: same signs, slightly scaled/noised → cosine ≈ 0.99
    for j in range(5):
        v = base[j] * 1.1 + np.sign(base[j]) * 0.01
        rows.append((100 + j, [float(x) for x in v.astype("float32")]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["ida"], r["idb"]) for r in embedding_near_duplicates(emb, 0.9).collect()}
    approx = {(r["ida"], r["idb"]) for r in embedding_near_duplicates_lsh(emb, 0.9).collect()}
    assert approx <= exact
    for j in range(5):
        assert (j, 100 + j) in approx, f"planted near-dup {j} missed"


def test_quality_micro_div_forms_agree(spark):
    """r6 perf fix (BENCH.md attribution): _idiv switched from the
    algebraic (a - a%b)/b to floor(a/b) — floor references its numerator
    ONCE, so the regexp_count subtrees stop being evaluated ~4x per row.
    The two forms must be value-identical: asserted over the full sf0.01
    corpus plus planted boundary texts (empty, 1-char, all-punct,
    stopword-only, 400+-char)."""
    from augmented_codebase_indexer_spark.operators.textstats import (
        STOPWORD_RE,
        quality_micro_col,
    )

    def algebraic(text):
        def old(a, b):
            b = F.lit(b) if isinstance(b, int) else b
            return ((a - a % b) / b).cast("long")

        nc = F.length(text).cast("long")
        nt = F.greatest(F.size(F.split(text, " ")), F.lit(1)).cast("long")
        stop = F.regexp_count(text, F.lit(STOPWORD_RE)).cast("long")
        punct = F.regexp_count(text, F.lit(r"[^\w\s]")).cast("long")
        nc2 = F.greatest(nc, F.lit(1))
        len_micro = F.least(nc, F.lit(400)) * 2500
        stop_micro = old(F.least(stop * 5, nt) * 1_000_000, nt)
        pen_micro = old(F.least(punct * 10, nc2) * 1_000_000, nc2)
        return old(
            (old(len_micro, 2) + old(stop_micro * 3, 10))
            * (F.lit(1_000_000) - old(pen_micro, 2)),
            1_000_000,
        )

    corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    planted = spark.createDataFrame(
        [(9001, ""), (9002, "x"), (9003, "!!! ??? ..."),
         (9004, "the the the the"), (9005, "a" * 500),
         (9006, "the cat! sat? on... the mat " * 20)],
        "doc_id long, text string",
    )
    docs = corpus.select("doc_id", "text").unionByName(planted)
    diffs = docs.select(
        quality_micro_col(F.col("text")).alias("a"),
        algebraic(F.col("text")).alias("b"),
    ).filter("a <> b OR (a IS NULL) <> (b IS NULL)").count()
    assert diffs == 0
