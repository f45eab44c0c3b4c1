"""Predicate volatility (operators/temporal.py) and edge reciprocity
(operators/graphalgs.py): hand-computed profiles, zero-closed guard,
self-loop exclusion, and DuckDB parity."""

from augmented_codebase_indexer_spark.operators.graphalgs import (
    reciprocity,
    reciprocity_oracle_sql,
)
from augmented_codebase_indexer_spark.operators.temporal import (
    predicate_volatility,
    predicate_volatility_sql,
    scd2_intervals,
)

FACTS = [
    # volatile pred: s1 flips V1→V2→V1 (3 versions), s2 stable
    ("s1", "works_for", "V1", 100), ("s1", "works_for", "V2", 200),
    ("s1", "works_for", "V1", 300),
    ("s2", "works_for", "V1", 100),
    # stable pred: one version each, never closed
    ("s1", "capital_of", "C1", 100), ("s2", "capital_of", "C2", 100),
]


def _intervals(spark):
    return scd2_intervals(
        spark.createDataFrame(FACTS, "subj string, pred string, obj string, ts long")
    )


def test_volatility_hand_computed(spark):
    got = {r["pred"]: r.asDict() for r in
           predicate_volatility(_intervals(spark)).collect()}
    w = got["works_for"]
    # s1: 3 versions (2 closed, durations 100+100), s2: 1 open
    assert (w["n_keys"], w["n_versions"], w["n_closed"]) == (2, 4, 2)
    assert w["versions_per_key_micro"] == 4 * 1_000_000 // 2
    assert w["closed_dur_s_total"] == 200
    assert w["mean_closed_dur_s"] == 100
    c = got["capital_of"]
    assert (c["n_keys"], c["n_versions"], c["n_closed"]) == (2, 2, 0)
    assert c["mean_closed_dur_s"] is None  # nothing closed — no div-by-0


def test_volatility_duckdb_parity(spark):
    import duckdb

    from augmented_codebase_indexer_spark.operators.temporal import scd2_oracle_sql

    facts_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj, {t} AS ts"
        for s, p, o, t in FACTS
    )
    got = sorted(map(tuple, predicate_volatility(_intervals(spark)).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        predicate_volatility_sql(
            f"SELECT * FROM ({scd2_oracle_sql(facts_sql)})"
        )
    ).fetchall()))
    assert got == want


EDGES = [
    ("a", "b"), ("b", "a"),          # mutual
    ("a", "c"),                      # one-way
    ("c", "c"),                      # self-loop: excluded
    ("a", "b"),                      # duplicate edge: deduped
    ("d", "a"),
]


def test_reciprocity_hand_computed(spark):
    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["node"]: (r["n_out"], r["n_recip"], r["reciprocity_micro"])
           for r in reciprocity(e).collect()}
    assert got == {
        "a": (2, 1, 500_000),   # out: b, c; mutual: b
        "b": (1, 1, 1_000_000),
        "d": (1, 0, 0),
    }


def test_reciprocity_duckdb_parity(spark):
    import duckdb

    lit = " UNION ALL ".join(
        f"SELECT '{s}' AS src, '{d}' AS dst" for s, d in EDGES
    )
    e = spark.createDataFrame(EDGES, "src string, dst string")
    got = sorted(map(tuple, reciprocity(e).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        reciprocity_oracle_sql(lit)).fetchall()))
    assert got == want
