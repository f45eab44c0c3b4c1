"""Witten-Milne relatedness (operators/relatedness.py): hand-built
in-link overlap vs a python mirror over ln_micro_py, hub-linker prune,
min_common filter, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.functions.intlog import ln_micro_py
from augmented_codebase_indexer_spark.operators.relatedness import (
    wlm_relatedness,
    wlm_relatedness_oracle_sql,
)

MICRO = 1_000_000

# linkers l1..l4: A in-linked by {l1,l2,l3}, B by {l1,l2,l4}, C by {l4}.
# Pairs: (A,B) common 2, (B,C) common 1.  N = |{l1..l4, A, B, C}| = 7.
EDGES = [
    ("l1", "A"), ("l2", "A"), ("l3", "A"),
    ("l1", "B"), ("l2", "B"), ("l4", "B"),
    ("l4", "C"),
]


def _df(spark, edges=EDGES):
    return spark.createDataFrame(edges, "src string, dst string")


def _wlm_py(deg_a, deg_b, common, n):
    ln = lambda v: ln_micro_py(v, 1)  # noqa: E731
    num = (ln(max(deg_a, deg_b)) - ln(common)) * MICRO
    den = ln(n) - ln(min(deg_a, deg_b))
    if den == 0:
        return None
    q = num // den
    return max(0, MICRO - q)


def test_planted_overlap(spark):
    rows = {(r["a"], r["b"]): r for r in wlm_relatedness(_df(spark)).collect()}
    ab = rows[("A", "B")]
    assert ab["common"] == 2 and ab["deg_a"] == 3 and ab["deg_b"] == 3
    assert ab["relatedness_micro"] == _wlm_py(3, 3, 2, 7)
    bc = rows[("B", "C")]
    assert bc["common"] == 1 and {bc["deg_a"], bc["deg_b"]} == {3, 1}
    assert bc["relatedness_micro"] == _wlm_py(3, 1, 1, 7)
    assert ("A", "C") not in rows  # no shared linker


def test_min_common_filter(spark):
    rows = wlm_relatedness(_df(spark), min_common=2).collect()
    assert [(r["a"], r["b"]) for r in rows] == [("A", "B")]


def test_hub_prune_drops_linker_everywhere(spark):
    # l1 linking 3 entities with max_out=2 → l1 removed from pairs AND
    # degrees (the consistent prune): A,B,C each lose the l1 in-link
    edges = EDGES + [("l1", "C")]
    rows = {(r["a"], r["b"]): r
            for r in wlm_relatedness(_df(spark, edges), max_out=2).collect()}
    ab = rows[("A", "B")]
    assert ab["common"] == 1 and ab["deg_a"] == 2 and ab["deg_b"] == 2


def test_validation(spark):
    with pytest.raises(ValueError):
        wlm_relatedness(_df(spark), min_common=0)


def test_matches_duckdb_oracle(spark):
    e_sql = " UNION ALL ".join(
        f"SELECT '{a}' AS src, '{b}' AS dst" for a, b in EDGES)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(wlm_relatedness_oracle_sql(e_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in wlm_relatedness(_df(spark)).collect())
    assert got == want and len(got) == 2
