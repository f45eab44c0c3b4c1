"""Co-mention PMI (operators/comention.py): hand-computed ratios,
per-doc distinctness, the quadratic-cap raise, and DuckDB parity."""

import pytest

from augmented_codebase_indexer_spark.operators.comention import (
    comention_pmi,
    comention_pmi_sql,
)

MENTIONS = [
    ("d1", "A"), ("d1", "B"), ("d1", "C"), ("d1", "A"),  # dup A in d1
    ("d2", "A"), ("d2", "B"),
    ("d3", "A"),
    ("d4", "B"), ("d4", "C"),
]
# N=4; n_A=3 n_B=3 n_C=2; n(A,B)=2 n(A,C)=1 n(B,C)=2


def _df(spark):
    return spark.createDataFrame(MENTIONS, "doc_id string, ent_id string")


def test_hand_computed_pmi(spark):
    got = {
        (r["ent_a"], r["ent_b"]): (
            r["n_ab"], r["n_a"], r["n_b"], r["pmi_ratio_micro"]
        )
        for r in comention_pmi(_df(spark)).collect()
    }
    assert got == {
        ("A", "B"): (2, 3, 3, 2 * 4 * 1_000_000 // 9),
        ("A", "C"): (1, 3, 2, 1 * 4 * 1_000_000 // 6),
        ("B", "C"): (2, 3, 2, 2 * 4 * 1_000_000 // 6),
    }
    # PMI monotonicity sanity: (B,C) co-occur every time C appears →
    # strongest association; (A,C) weakest
    assert got[("B", "C")][3] > got[("A", "B")][3] > got[("A", "C")][3]


def test_cap_raises_on_hub_doc(spark):
    rows = [("hub", f"e{i}") for i in range(10)] + [("d", "e0")]
    df = spark.createDataFrame(rows, "doc_id string, ent_id string")
    with pytest.raises(ValueError, match="quadratic"):
        comention_pmi(df, max_entities_per_doc=5)
    assert comention_pmi(df, max_entities_per_doc=None).count() == 45


def test_duckdb_parity(spark):
    import duckdb

    lit = " UNION ALL ".join(
        f"SELECT '{d}' AS doc_id, '{e}' AS ent" for d, e in MENTIONS
    )
    got = sorted(map(tuple, comention_pmi(_df(spark)).collect()))
    want = sorted(
        map(tuple, duckdb.connect().execute(comention_pmi_sql(lit)).fetchall())
    )
    assert got == want
