"""Dunning G² collocations (operators/collocations.py): planted
collocation flagged, independent pair not, float-mirror audit of the
intlog G², zero-cell exactness, min_count pruning, DuckDB parity."""

import math

import duckdb

from augmented_codebase_indexer_spark.operators.collocations import (
    SIG_MICRO,
    bigram_llr,
    bigram_llr_oracle_sql,
)
from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py

# 'new york' always adjacent (planted collocation); 'the' is everywhere
# (independent of what follows); singleton doc exercises the
# empty-pair-array guard.
DOCS = [
    (0, "the new york office of the new york branch"),
    (1, "the cat sat on the mat in the house"),
    (2, "new york is the city the people like"),
    (3, "word"),
    (4, ""),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _g2_float(k11, r1, c1, n):
    """Float G² — the audit ceiling for the integer construction."""
    cells = [
        (k11, r1 * c1),
        (r1 - k11, r1 * (n - c1)),
        (c1 - k11, (n - r1) * c1),
        (n - r1 - c1 + k11, (n - r1) * (n - c1)),
    ]
    return 2 * sum(
        k * math.log(k * n / rc) for k, rc in cells if k > 0 and rc > 0
    )


def test_planted_collocation(spark):
    rows = {
        (r["w1"], r["w2"]): r for r in bigram_llr(_df(spark)).collect()
    }
    ny = rows[("new", "york")]
    assert ny["k11"] == 3 and ny["is_collocation"]
    # 'the' pairs are spread across many continuations → not significant
    assert not rows[("the", "new")]["is_collocation"]
    # singleton and empty docs contribute no pairs
    n = ny["n_pairs"]
    assert n == sum(
        max(len([t for t in txt.split(" ") if t]) - 1, 0) for _, txt in DOCS
    )


def test_integer_g2_matches_float_mirror(spark):
    # the intlog G² must sit within the per-term quantization budget of
    # the float G²: 4 terms, each k·(ln_micro error ≤ 1) → |Δ| ≤ 2·Σk·1,
    # loose-bounded here by 2·4·n_pairs micro units
    for r in bigram_llr(_df(spark)).collect():
        f = _g2_float(r["k11"], r["r1"], r["c1"], r["n_pairs"]) * 1e6
        assert abs(r["llr_micro"] - f) <= 8 * r["n_pairs"] + 4, (
            r["w1"], r["w2"], r["llr_micro"], f,
        )


def test_zero_cells_contribute_zero(spark):
    # pick a pair where k12 = 0 (w1 only ever precedes w2): 'on the'
    rows = {
        (r["w1"], r["w2"]): r for r in bigram_llr(_df(spark)).collect()
    }
    r = rows[("on", "the")]
    assert r["r1"] == r["k11"]  # k12 = 0 cell
    f = _g2_float(r["k11"], r["r1"], r["c1"], r["n_pairs"]) * 1e6
    assert abs(r["llr_micro"] - f) <= 8 * r["n_pairs"] + 4


def test_min_count_prunes_output_not_margins(spark):
    full = {
        (r["w1"], r["w2"]): r for r in bigram_llr(_df(spark)).collect()
    }
    pruned = {
        (r["w1"], r["w2"]): r
        for r in bigram_llr(_df(spark), min_count=2).collect()
    }
    assert all(r["k11"] >= 2 for r in pruned.values())
    # surviving rows carry UNCHANGED margins/statistics
    for key, r in pruned.items():
        assert r["llr_micro"] == full[key]["llr_micro"]
    assert len(pruned) < len(full)


def test_matches_duckdb_oracle(spark):
    docs_sql = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, '{t}' AS text" for d, t in DOCS
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(bigram_llr_oracle_sql(f"({docs_sql})"))
        .fetchall()
    )
    got = sorted(tuple(r) for r in bigram_llr(_df(spark)).collect())
    assert got == want and len(got) > 10
    assert SIG_MICRO == 10_830_000
