"""LM-quality gates: CCNet-style cross-entropy and DSIR importance
weights against a pure-python mirror, planted-document semantics, and the
vocab-cap (pruned-token → OOV) contract."""

import math

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py
from augmented_codebase_indexer_spark.operators.lmquality import (
    dsir_log_ratio,
    lm_cross_entropy,
    token_frame,
    unigram_logprobs,
)


def _py_unigram(ref_texts, max_vocab=None):
    counts = {}
    for t in ref_texts:
        for tok in t.split(" "):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
    if max_vocab is not None:
        keep = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
        counts = dict(keep)
    T = sum(counts.values())
    V = len(counts)
    # r6: the quantization is the libm-free fixed-point integer log —
    # the python mirror IS ln_micro_py, not round(ln(·)·1e6)
    lp = {tok: ln_micro_py(c + 1, T + V + 1) for tok, c in counts.items()}
    oov = ln_micro_py(1, T + V + 1)
    return lp, oov


def _py_doc_sum(text, lp, oov):
    toks = [t for t in text.split(" ") if t]
    return len(toks), sum(lp.get(t, oov) for t in toks)


DOCS = [
    (0, "the cat sat on the mat and the dog sat too"),
    (1, "the dog ran to the cat and the mat stayed"),
    (2, "qzxv blorp wibble snarf qzxv gromp flib"),  # gibberish: all-OOV
    (3, "the the the the the the the the"),  # degenerate repetition
    (4, ""),  # empty: no tokens, absent from output
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_cross_entropy_matches_python_mirror(spark, docs):
    ref = docs.filter(F.col("doc_id") < 2)
    out = {
        r["doc_id"]: r
        for r in lm_cross_entropy(docs, ref, buckets=(3.0, 4.0)).collect()
    }
    lp, oov = _py_unigram([t for _, t in DOCS[:2]])
    for doc_id, text in DOCS:
        n, s = _py_doc_sum(text, lp, oov)
        if n == 0:
            assert doc_id not in out  # empty doc: nothing to score
            continue
        row = out[doc_id]
        assert row["n_tokens"] == n
        assert row["sum_lp_micro"] == s  # exact integer parity
        # truncating BIGINT division — Spark DIV must truncate toward
        # zero exactly like python // on the positive operand
        assert row["ce_micro"] == (-s) // n


def test_gibberish_scores_worse_than_prose(spark, docs):
    ref = docs.filter(F.col("doc_id") < 2)
    out = {
        r["doc_id"]: r["ce_micro"]
        for r in lm_cross_entropy(docs, ref).collect()
    }
    # all-OOV gibberish must be the worst; pure-stopword repetition the best
    assert out[2] == max(out.values())
    assert out[3] == min(out.values())


def test_bucket_assignment_uses_cuts(spark, docs):
    ref = docs.filter(F.col("doc_id") < 2)
    rows = lm_cross_entropy(docs, ref, buckets=(2.0, 5.0)).collect()
    for r in rows:
        # integer cross-multiply semantics: -sum_lp_micro < cut_micro * n
        neg = -r["sum_lp_micro"]
        want = (
            "head" if neg < 2_000_000 * r["n_tokens"]
            else "middle" if neg < 5_000_000 * r["n_tokens"]
            else "tail"
        )
        assert r["ppl_bucket"] == want, r


def test_vocab_cap_prunes_to_oov(spark, docs):
    """max_vocab_rows keeps top-K by (count desc, tok); pruned tokens score
    as OOV — mirrored exactly by the python model with the same cap."""
    ref = docs.filter(F.col("doc_id") < 2)
    out = {
        r["doc_id"]: r["sum_lp_micro"]
        for r in lm_cross_entropy(docs, ref, max_vocab_rows=3).collect()
    }
    lp, oov = _py_unigram([t for _, t in DOCS[:2]], max_vocab=3)
    assert len(lp) == 3
    for doc_id, text in DOCS:
        n, s = _py_doc_sum(text, lp, oov)
        if n:
            assert out[doc_id] == s


def test_dsir_matches_python_and_separates_domains(spark):
    target = [(i, "alpha beta gamma delta alpha beta") for i in range(3)]
    offdom = [(10 + i, "omega sigma tau rho omega sigma") for i in range(3)]
    mixed = [(20, "alpha beta omega sigma")]
    all_docs = target + offdom + mixed
    docs = spark.createDataFrame(all_docs, ["doc_id", "text"])
    tgt = docs.filter(F.col("doc_id") < 3)
    out = {r["doc_id"]: r for r in dsir_log_ratio(docs, tgt).collect()}

    t_lp, t_oov = _py_unigram([t for _, t in target])
    r_lp, r_oov = _py_unigram([t for _, t in all_docs])
    for doc_id, text in all_docs:
        n, st = _py_doc_sum(text, t_lp, t_oov)
        _, sr = _py_doc_sum(text, r_lp, r_oov)
        assert out[doc_id]["sum_llr_micro"] == st - sr
        assert out[doc_id]["n_tokens"] == n
    # target-domain docs get positive weights, off-domain negative
    for i in range(3):
        assert out[i]["sum_llr_micro"] > 0
        assert out[10 + i]["sum_llr_micro"] < 0
        # per-token column is truncating division, negative-safe: Spark
        # DIV must agree with trunc-toward-zero (NOT python floor //)
        for r in (out[i], out[10 + i]):
            s_, n_ = r["sum_llr_micro"], r["n_tokens"]
            trunc = abs(s_) // n_ * (1 if s_ >= 0 else -1)
            assert r["llr_per_tok_micro"] == trunc
    # the mixed doc sits strictly between the two blocks (per-token scale)
    assert (
        out[10]["llr_per_tok_micro"]
        < out[20]["llr_per_tok_micro"]
        < out[0]["llr_per_tok_micro"]
    )


_tok = st.sampled_from(["alpha", "beta", "gamma", "zz", "qq", "x"])
_doc = st.lists(_tok, min_size=0, max_size=12).map(" ".join)
docs_strategy = st.lists(_doc, min_size=2, max_size=12)


@given(docs_strategy, st.integers(1, 3), st.integers(0, 5))
@settings(max_examples=12, deadline=None)
def test_lm_property_vs_python(spark, texts, ref_mod, cap):
    """Random corpora (empty docs, OOV-heavy docs, tiny vocabs), random
    reference slices and vocab caps: exact integer parity with the
    python mirror on every document."""
    rows = list(enumerate(texts))
    ref_texts = [t for i, t in rows if i % ref_mod == 0]
    if not any(tok for t in ref_texts for tok in t.split()):
        return  # empty reference LM: operator has nothing to train on
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    max_vocab = cap if cap > 0 else None
    out = {
        r["doc_id"]: r
        for r in lm_cross_entropy(
            df, df.filter(F.col("doc_id") % ref_mod == 0),
            max_vocab_rows=max_vocab,
        ).collect()
    }
    lp, oov = _py_unigram(ref_texts, max_vocab=max_vocab)
    for i, t in rows:
        n, s = _py_doc_sum(t, lp, oov)
        if n == 0:
            assert i not in out
        else:
            assert (out[i]["n_tokens"], out[i]["sum_lp_micro"]) == (n, s)


def test_unigram_logprobs_shapes(spark, docs):
    ref = token_frame(docs.filter(F.col("doc_id") < 2))
    vocab, totals = unigram_logprobs(ref)
    tot = totals.collect()[0]
    assert tot["V"] == vocab.count()
    assert tot["T"] == ref.count()
    assert tot["oov_lp_micro"] < 0
    assert set(vocab.columns) == {"tok", "lp_micro"}


def test_rounding_tie_distance_audit():
    """Measured tie-distance bounds for quantities that still quantize a
    float ONCE at a well-separated point (VERDICT r4 Next #1 sweep). A
    round/floor on a float is cross-engine-safe when the value's distance
    from the nearest half-way tie is orders of magnitude above 1-ulp
    noise (~1e-10 at the 1e6 scale); this test measures the minimum
    distance on the driver-gated sf0.01 data + the full parameter domain
    and fails if anything drifts within 100x of the noise floor.

    (Rationals of small integers — jaccard, aa sums, ce, llr — are NOT
    audited but constructed: they are exact BIGINT arithmetic end-to-end
    as of r5, because rationals DO land exactly on ties: 6/500 sf0.01
    docs for cross-entropy, 5/500 for the float quality score.

    r6: every ln-derived quantize-once — lm/dsir/langid vocab lp,
    slice_kl lp, tfidf idf_micro, adamic-adar w_micro — now comes from
    the LIBM-FREE fixed-point integer log (functions/intlog.py), so
    there is nothing left to tie-audit there: the quantization is BIGINT
    by construction and its cross-engine parity is asserted directly in
    tests/test_intlog.py. The floats remaining in any gate are the two
    audited below.)"""
    import numpy as np

    # 1. adamic_adar w_micro: since r6 constructed as
    #    (1e12 + lnm DIV 2) DIV lnm over the integer log — assert the
    #    intlog-derived weight stays within 1 micro of the libm value
    #    over every degree a post-cap graph can produce (semantic guard,
    #    not a tie audit; cross-engine exactness is by construction).
    from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py

    for deg in list(range(2, 2000)) + [10**5, 10**6, 10**9]:
        lnm = ln_micro_py(deg, 1)
        w_int = (10**12 + lnm // 2) // lnm
        w_libm = round(1e6 / math.log(deg))
        assert abs(w_int - w_libm) <= 1, (deg, w_int, w_libm)

    # 2. ann cosine (round(cos, 6) in the gated top-k frames): all-pairs
    #    cosine over the sf0.01 embeddings table. Measured min 1.63e-6.
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT embedding FROM '/root/testdata/sf0.01/embeddings.parquet'"
    ).fetchall()
    V = np.array([r[0] for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = (Vn @ Vn.T)[np.triu_indices(len(Vn), k=1)]
    d = np.abs(((C * 1e6) % 1.0) - 0.5)
    assert d.min() > 1e-7, "cosine tie in sf0.01 embeddings"

    # 3. minhash est_jaccard = matches/16: every reachable value m/16
    #    scales to an exact integer at 1e6 (m * 62500) — statically never
    #    a tie, for all m.
    assert all((m * 1_000_000) % 16 == 0 for m in range(17))
