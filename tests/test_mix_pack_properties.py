"""Property tests: the sampling/packing operators equal exact pure-Python
references (same md5-derived ordering hash) on randomized inputs — the
window arithmetic has no hidden dependence on partitioning or order."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from augmented_codebase_indexer_spark.operators.sampling import (
    pack_sequences,
    training_mix,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


docs_strategy = st.lists(
    st.tuples(st.integers(0, 500), st.sampled_from(["a", "b", "c"]),
              st.integers(1, 50)),
    min_size=1, max_size=25, unique_by=lambda t: t[0],
)


@given(docs_strategy, st.integers(1, 200))
@settings(max_examples=10, deadline=None)
def test_training_mix_matches_python_reference(spark, rows, budget):
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = {
        (r["doc_id"], r["source"], r["n_tokens"], r["mix_order"], r["cum_tokens"])
        for r in training_mix(df, {"a": budget, "b": budget}).collect()
    }
    want = set()
    for src in ("a", "b"):
        cum, order = 0, 0
        for doc_id, _s, n in sorted(
            (t for t in rows if t[1] == src),
            key=lambda t: (_h60(str(t[0])), t[0]),
        ):
            if cum < budget:
                order += 1
                cum += n
                want.add((doc_id, src, n, order, cum))
            else:
                break
    assert got == want


chunks_strategy = st.lists(
    st.tuples(st.integers(0, 300), st.integers(1, 4)),
    min_size=1, max_size=20, unique_by=lambda t: t[0],
)


@given(chunks_strategy, st.integers(5, 300), st.integers(1, 8))
@settings(max_examples=10, deadline=None)
def test_pack_sequences_matches_python_reference(spark, docs, budget, n_shards):
    rows = [
        (d, f"c{d}-{p}", p, 10 + (d + p) % 37)
        for d, parts in docs for p in range(parts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_id string, part_index int, n_tokens long"
    )
    got = {
        (r["doc_id"], r["chunk_id"], r["shard"], r["bin_id"], r["offset_tokens"])
        for r in pack_sequences(df, budget=budget, n_shards=n_shards).collect()
    }
    by_shard = {}
    for d, cid, p, n in rows:
        h = _h60(str(d))
        by_shard.setdefault(h % n_shards, []).append((h, d, p, cid, n))
    want = set()
    for shard, members in by_shard.items():
        cum = 0
        for h, d, p, cid, n in sorted(members):
            want.add((d, cid, shard, cum // budget, cum % budget))
            cum += n
    assert got == want
