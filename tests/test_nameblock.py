"""Name blocking (operators/nameblock.py): hand candidate set, the
both-ends-edited miss class, block-cap drop, quality metrics, DuckDB
parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.nameblock import (
    block_candidates,
    block_candidates_oracle_sql,
    blocking_quality,
    blocking_quality_oracle_sql,
)

MICRO = 1_000_000

NAMES = [
    ("r1", "acme corp"),
    ("r2", "acme corp."),   # dist 1 to r1, shares prefix key only
    ("r3", "acme korp"),    # dist 1 to r1, shares both keys
    ("r4", "zzz acme"),     # no shared key with anyone
    ("r5", "xacme corpx"),  # dist 2 to r1 but BOTH ends edited -> missed
    ("r6", "acme corp"),    # exact duplicate of r1
]
TRUTH = [("r1", "r2"), ("r1", "r5"), ("r1", "r6")]


def _names(spark):
    return spark.createDataFrame(NAMES, "id string, name string")


def test_candidates_and_miss_class(spark):
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in block_candidates(_names(spark)).collect()
    }
    assert got == {
        ("r1", "r2", 1), ("r1", "r3", 1), ("r1", "r6", 0),
        ("r2", "r3", 2), ("r2", "r6", 1), ("r3", "r6", 1),
    }
    # r5 is a true pair at dist 2 but edited at both ends -> absent
    assert not any("r5" in (a, b) for a, b, _ in got)


def test_block_cap_drops_whole_key(spark):
    # cap 3: the 4-name 'p:ac' block drops, the 3-name 's:rp' survives
    got = {
        (r["id_a"], r["id_b"])
        for r in block_candidates(_names(spark), block_cap=3).collect()
    }
    assert got == {("r1", "r3"), ("r1", "r6"), ("r3", "r6")}


def test_quality_metrics(spark):
    truth = spark.createDataFrame(TRUTH, "id_a string, id_b string")
    row = blocking_quality(
        block_candidates(_names(spark)), truth, _names(spark)
    ).collect()[0]
    assert row["n_records"] == 6 and row["n_total_pairs"] == 15
    assert row["n_candidates"] == 6
    assert (row["n_true"], row["n_found"]) == (3, 2)
    assert row["pair_completeness_micro"] == 2 * MICRO // 3
    assert row["reduction_ratio_micro"] == MICRO - 6 * MICRO // 15


def test_matches_duckdb_oracle(spark):
    names_sql = " UNION ALL ".join(
        f"SELECT '{i}' AS id, '{n}' AS name" for i, n in NAMES)
    truth_sql = " UNION ALL ".join(
        f"SELECT '{a}' AS id_a, '{b}' AS id_b" for a, b in TRUTH)
    con = duckdb.connect()
    want_c = sorted(tuple(r) for r in con.execute(
        block_candidates_oracle_sql(names_sql)).fetchall())
    got_c = sorted(tuple(r) for r in block_candidates(_names(spark)).collect())
    assert got_c == want_c
    want_q = con.execute(
        blocking_quality_oracle_sql(names_sql, truth_sql)).fetchall()
    truth = spark.createDataFrame(TRUTH, "id_a string, id_b string")
    got_q = [tuple(r) for r in blocking_quality(
        block_candidates(_names(spark)), truth, _names(spark)).collect()]
    assert got_q == [want_q[0]]
