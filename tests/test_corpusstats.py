"""Corpus distribution statistics (operators/corpusstats.py): inter-slice
KL divergence and the Zipf frequency profile — planted-corpus gates plus
exact-integer python mirrors (the module shares lmquality's micro-nat
quantization discipline, so every gated value must reproduce bit-for-bit
from integer arithmetic)."""

import math
from collections import Counter

import pyspark.sql.functions as F  # noqa: F401

from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py
from augmented_codebase_indexer_spark.operators.corpusstats import (
    slice_kl_divergence,
    zipf_profile,
)


def _py_kl(slices: dict) -> dict:
    """Exact-integer mirror: {(a, b): (kl_num_micro, kl_micro)}."""
    counts = {s: Counter(" ".join(texts).split()) for s, texts in slices.items()}
    vocab = sorted(set().union(*[set(c) for c in counts.values()]))
    V = len(vocab)
    T = {s: sum(c.values()) for s, c in counts.items()}
    lp = {
        s: {
            tok: ln_micro_py(counts[s][tok] + 1, T[s] + V + 1)
            for tok in vocab
        }
        for s in counts
    }
    out = {}
    for a in counts:
        for b in counts:
            if a == b:
                continue
            num = sum(
                (counts[a][tok] + 1) * (lp[a][tok] - lp[b][tok])
                for tok in vocab
            )
            d = T[a] + V + 1
            trunc = abs(num) // d * (1 if num >= 0 else -1)
            out[(a, b)] = (num, trunc)
    return out


def _mk(spark, slices):
    rows = [
        (i, s, t)
        for i, (s, t) in enumerate(
            (s, t) for s, texts in sorted(slices.items()) for t in texts
        )
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_kl_identical_slices_is_zero(spark):
    """Two slices with identical token counts have identical smoothed LMs,
    so the quantized KL numerator cancels EXACTLY — no quantization
    residue on the diagonal-equivalent case."""
    slices = {
        "a": ["the cat sat on the mat", "dogs chase the cat"],
        "b": ["the cat sat on the mat", "dogs chase the cat"],
    }
    rows = slice_kl_divergence(_mk(spark, slices)).collect()
    assert len(rows) == 2
    assert all(r["kl_num_micro"] == 0 and r["kl_micro"] == 0 for r in rows)


def test_kl_matches_python_mirror_and_is_asymmetric(spark):
    """Planted skewed slices: every (a, b) pair matches the exact-integer
    python mirror; KL is positive off the identical case and genuinely
    asymmetric (KL(a||b) != KL(b||a))."""
    slices = {
        "news": ["the market rose today the market fell",
                 "traders sold the shares and bought bonds"],
        "recipes": ["stir the flour into the butter and sugar",
                    "bake the dough until the crust is golden"],
        "mixed": ["the market bought flour and the traders bake"],
    }
    want = _py_kl(slices)
    got = {
        (r["src_a"], r["src_b"]): (r["kl_num_micro"], r["kl_micro"])
        for r in slice_kl_divergence(_mk(spark, slices)).collect()
    }
    assert got == want
    assert len(got) == 6
    assert all(num > 0 for num, _ in got.values())
    assert got[("news", "recipes")] != got[("recipes", "news")]


def test_zipf_profile_exact(spark):
    """Planted frequencies: rank order (count desc, tok asc — ties by
    token), counts exact, and cum_micro is the truncating integer share
    of the FULL corpus total (tokens outside the top-N still count in
    the denominator)."""
    #            aa×5          bb×3       cc×3        dd×1  ee×1
    docs = [(0, "aa aa aa bb bb cc"), (1, "aa aa bb cc cc dd ee")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = zipf_profile(df, top_n=3).collect()
    total = 13
    assert [(r["rank"], r["tok"], r["cnt"]) for r in rows] == [
        (1, "aa", 5), (2, "bb", 3), (3, "cc", 3)]  # bb < cc breaks the tie
    cums = [5, 8, 11]
    assert [r["cum_micro"] for r in rows] == [
        c * 1_000_000 // total for c in cums]


def test_zipf_topn_bounds_output(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i:03d} common") for i in range(40)],
        "doc_id long, text string")
    rows = zipf_profile(df, top_n=5).collect()
    assert len(rows) == 5
    assert rows[0]["tok"] == "common" and rows[0]["cnt"] == 40
    # ranks are 1..5 dense and cum_micro is monotone increasing
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    assert all(x < y for x, y in zip(
        [r["cum_micro"] for r in rows], [r["cum_micro"] for r in rows][1:]))
