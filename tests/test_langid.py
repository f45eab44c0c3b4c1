"""Content-based language ID (operators/langid.py): planted
mixed-language semantics, exact-integer argmax determinism, vocab-cap
contract, and a pure-python mirror of the trained model."""

import math

import pyspark.sql.functions as F
import pytest

from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py
from augmented_codebase_indexer_spark.operators.langid import (
    gram_frame,
    lang_id_ngram,
)

# real-language sentences (public common phrases) — the synthetic corpus'
# lang labels are random over identical text, so the SEMANTIC gate lives
# here, on genuinely different character distributions
EN = [
    "the quick brown fox jumps over the lazy dog and runs away with it",
    "this is a sentence written in the english language for the test",
    "what we think about when we talk about the weather with the others",
]
DE = [
    "der schnelle braune fuchs springt ueber den faulen hund und rennt weg",
    "dies ist ein satz der in deutscher sprache geschrieben wurde zum test",
    "worueber wir nachdenken wenn wir ueber das wetter mit anderen sprechen",
]
FR = [
    "le renard brun rapide saute par dessus le chien paresseux et s'enfuit",
    "ceci est une phrase ecrite en langue francaise pour le test du jour",
    "ce que nous pensons quand nous parlons du temps avec les autres gens",
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def planted(spark):
    rows = (
        [(i, t, "en") for i, t in enumerate(EN)]
        + [(10 + i, t, "de") for i, t in enumerate(DE)]
        + [(20 + i, t, "fr") for i, t in enumerate(FR)]
    )
    return _mk(spark, rows)


def test_heldout_docs_recover_their_language(spark, planted):
    """Train on the planted labeled docs, score UNSEEN same-language text:
    every held-out doc must map back to its true language."""
    unseen = _mk(spark, [
        (100, "the dog and the fox think about the weather over there", None),
        (101, "der hund und der fuchs denken ueber das wetter nach", None),
        (102, "le chien et le renard pensent au temps de la journee", None),
    ])
    out = {r["doc_id"]: r["lang_pred"]
           for r in lang_id_ngram(unseen, train_docs=planted).collect()}
    assert out == {100: "en", 101: "de", 102: "fr"}


def test_mixed_doc_goes_to_majority_language(spark, planted):
    mixed = _mk(spark, [
        # mostly German with one English clause
        (200, "der schnelle fuchs springt ueber den hund the quick fox", None),
    ])
    out = lang_id_ngram(mixed, train_docs=planted).collect()
    assert out[0]["lang_pred"] == "de"


def test_self_training_labels_itself(spark, planted):
    """Self-trained (train_docs=None): every labeled planted doc is
    predicted as its own label — the LMs separate cleanly."""
    out = {r["doc_id"]: r["lang_pred"] for r in lang_id_ngram(planted).collect()}
    want = {i: "en" for i in range(3)}
    want.update({10 + i: "de" for i in range(3)})
    want.update({20 + i: "fr" for i in range(3)})
    assert out == want


def test_short_docs_absent_and_tie_breaks_by_code(spark):
    """Docs with < n chars have no grams → absent (lm_quality contract);
    an EXACT score tie (identical training slices for two labels) breaks
    by language code ascending."""
    # two languages trained on the SAME text → every doc ties exactly
    tied = _mk(spark, [(0, "abcabc", "aa"), (1, "abcabc", "bb"),
                       (2, "x", "aa")])
    out = {r["doc_id"]: r for r in lang_id_ngram(tied).collect()}
    assert 2 not in out  # 1-char doc: no bigrams
    assert out[0]["lang_pred"] == "aa" and out[1]["lang_pred"] == "aa"


def test_scores_match_python_mirror(spark, planted):
    """Exact-integer parity of the BIGINT score sums with a pure-python
    add-one shared-vocab mirror (the lmquality discipline)."""
    rows = planted.collect()
    grams = lambda t: [t[i:i + 2] for i in range(len(t) - 1)]  # noqa: E731
    counts, tot = {}, {}
    for r in rows:
        for g in grams(r["text"]):
            counts.setdefault(r["lang"], {})
            counts[r["lang"]][g] = counts[r["lang"]].get(g, 0) + 1
    vocab = {g for d in counts.values() for g in d}
    V = len(vocab)
    for lg, d in counts.items():
        tot[lg] = sum(d.values())
    lp = {
        lg: {g: ln_micro_py(d.get(g, 0) + 1, tot[lg] + V + 1) for g in vocab}
        for lg, d in counts.items()
    }
    oov = {lg: ln_micro_py(1, tot[lg] + V + 1) for lg in counts}
    out = {r["doc_id"]: r for r in lang_id_ngram(planted).collect()}
    for r in rows:
        gs = grams(r["text"])
        want = {
            lg: sum(lp[lg][g] if g in vocab else oov[lg] for g in gs)
            for lg in counts
        }
        got = out[r["doc_id"]]
        assert got["n_grams"] == len(gs)
        assert got["best_micro"] == max(want.values())
        assert got["lang_pred"] == min(
            lg for lg, s in want.items() if s == max(want.values())
        )


def test_vocab_cap_prunes_to_oov(spark, planted):
    """max_vocab_rows=1: only the single most frequent gram survives;
    every other gram scores as OOV on both the operator and the mirror —
    predictions stay deterministic and n_grams unchanged."""
    full = {r["doc_id"]: r["n_grams"]
            for r in lang_id_ngram(planted).collect()}
    capped = {r["doc_id"]: r["n_grams"]
              for r in lang_id_ngram(planted, max_vocab_rows=1).collect()}
    assert full == capped  # pruning changes scores, never coverage


def test_gram_frame_counts(spark):
    df = _mk(spark, [(0, "abcd", "en"), (1, "", "en")])
    got = gram_frame(df).collect()
    assert sorted((r["doc_id"], r["gram"]) for r in got) == [
        (0, "ab"), (0, "bc"), (0, "cd")
    ]
