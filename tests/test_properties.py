"""Property-based tests (Hypothesis) over the pure shared functions — the
reference's dominant test tier (66 property files, SURVEY.md §5). No Spark
needed: these functions ARE what the UDFs execute."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from augmented_codebase_indexer_spark.functions.hashing import (
    hamming64,
    hash_embedding,
    jaccard_shingles,
    lsh_band_keys,
    minhash_signature,
    rolling_fingerprint,
    simhash64,
)
from augmented_codebase_indexer_spark.functions.openie import (
    PRED_CONNECTORS,
    build_alias_regex,
    extract_triples_from_text,
    find_mentions,
    normalize_alias,
)
from augmented_codebase_indexer_spark.functions.textextract import extract_text

html_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=400,
)


@given(html_text)
@settings(max_examples=200, deadline=None)
def test_extract_never_emits_tags_and_is_deterministic(s):
    html = f"<html><body><nav>skip</nav><p>{s}</p></body></html>".encode("utf-8")
    a, b = extract_text(html), extract_text(html)
    assert a == b  # same bytes → same text, always
    assert a is not None
    assert "<p>" not in a and "</p>" not in a and "skip" not in a


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_extract_total_on_arbitrary_bytes(b):
    """Never raises; returns None only under the documented skip rules."""
    out = extract_text(b)
    if b"\x00" in b:
        assert out is None
    elif out is None:
        try:
            b.decode("utf-8")
            raise AssertionError("None for decodable, NUL-free input")
        except UnicodeDecodeError:
            pass


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_normalize_alias_idempotent(s):
    n = normalize_alias(s)
    assert normalize_alias(n) == n
    assert n == n.lower().strip()


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=100, deadline=None)
def test_minhash_signature_shape_and_determinism(s):
    sig = minhash_signature(s)
    assert len(sig) == 32
    assert sig == minhash_signature(s)
    assert all(0 <= x < 2 ** 32 for x in sig)
    keys = lsh_band_keys(sig, 8)
    assert len(keys) == 8 and len(set(keys)) == len(keys)  # band index prefixes differ


@given(st.text(min_size=1, max_size=100))
@settings(max_examples=100, deadline=None)
def test_jaccard_reflexive_and_bounded(s):
    assert jaccard_shingles(s, s) == 1.0
    assert 0.0 <= jaccard_shingles(s, s + "xyz") <= 1.0


@given(st.text(max_size=150), st.text(max_size=150))
@settings(max_examples=100, deadline=None)
def test_identical_minhash_when_identical_text(a, b):
    if a == b:
        assert minhash_signature(a) == minhash_signature(b)
    # contrapositive sanity: different sigs ⇒ different texts
    if minhash_signature(a) != minhash_signature(b):
        assert a != b


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_simhash_and_fingerprint_deterministic(s):
    assert simhash64(s) == simhash64(s)
    assert hamming64(simhash64(s), simhash64(s)) == 0
    assert -(2 ** 63) <= simhash64(s) < 2 ** 63  # fits Spark LongType
    fp = rolling_fingerprint(s)
    assert fp == rolling_fingerprint(s)
    assert len(fp) <= 16 and fp == sorted(fp)
    assert all(0 <= x < 2 ** 32 for x in fp)  # bigint range (ADVICE r1: not int32)


@given(st.text(alphabet="abcdefgh ", max_size=200))
@settings(max_examples=100, deadline=None)
def test_sql_portable_sketch_mirrors(s):
    """Pure mirrors of the SQL-native sketches (functions/sqlhash.py):
    shape, determinism, and value ranges — the Spark-vs-Python equality is
    pinned in tests/test_operators.py with a live session."""
    from augmented_codebase_indexer_spark.functions.hashing import (
        h60,
        minhash16,
        minhash_est_jaccard,
        simhash60,
    )

    assert 0 <= h60(s) < 2 ** 60
    sig = minhash16(s)
    assert len(sig) == 16 and sig == minhash16(s)
    assert all(0 <= x < 2 ** 31 for x in sig)
    assert minhash_est_jaccard(sig, sig) == 1.0
    sh = simhash60(s)
    if s.strip(" "):
        assert 0 <= sh < 2 ** 60 and sh == simhash60(s)
    else:
        assert sh is None  # blank text must not fingerprint as 0


@given(st.text(max_size=100))
@settings(max_examples=100, deadline=None)
def test_hash_embedding_unit_norm(s):
    v = hash_embedding(s, 64)
    assert len(v) == 64
    n = sum(x * x for x in v) ** 0.5
    assert abs(n - 1.0) < 1e-9 or n == 0.0
    assert v == hash_embedding(s, 64)


name_token = st.text(alphabet="ABCDEFGHij", min_size=1, max_size=8).map(
    lambda s: s[0].upper() + s[1:].lower()
)
alias_strategy = st.lists(name_token, min_size=1, max_size=3).map(" ".join)


@given(st.lists(alias_strategy, min_size=1, max_size=10, unique=True), st.data())
@settings(max_examples=100, deadline=None)
def test_planted_triple_always_recovered(aliases, data):
    """For any gazetteer and any subject/object drawn from it, a templated
    relation sentence yields exactly that candidate triple (requirement: the
    extractor recovers every planted fact whose surfaces are in-gazetteer)."""
    rx = build_alias_regex(aliases)
    subj = data.draw(st.sampled_from(aliases))
    obj = data.draw(st.sampled_from(aliases))
    pred = data.draw(st.sampled_from(sorted(PRED_CONNECTORS)))
    text = f"{subj} {PRED_CONNECTORS[pred]} {obj}."
    triples = extract_triples_from_text(text, rx)
    assert any(
        t.pred == pred and t.subj_surface == subj and t.obj_surface == obj for t in triples
    ), (text, triples)


@given(st.lists(alias_strategy, min_size=1, max_size=8, unique=True), html_text)
@settings(max_examples=100, deadline=None)
def test_mentions_never_overlap(aliases, filler):
    rx = build_alias_regex(aliases)
    text = filler.replace("\x00", "") + " " + " and ".join(aliases)
    ms = find_mentions(text, rx)
    for a, b in zip(ms, ms[1:]):
        assert a.end <= b.start  # dedup guarantees disjoint, ordered spans
    for m in ms:
        assert text[m.start : m.end] == m.surface
