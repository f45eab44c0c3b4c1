"""Cohen's kappa (operators/agreement.py): hand-computed value on the
textbook 2×2 table, perfect/chance/constant edge cases, joint-set
semantics, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.agreement import (
    cohens_kappa,
    cohens_kappa_oracle_sql,
)


def _dfs(spark, a_rows, b_rows):
    a = spark.createDataFrame(a_rows, "item long, label string")
    b = spark.createDataFrame(b_rows, "item long, label string")
    return a, b


def test_textbook_value(spark):
    # classic 2x2: N=100, agree=70 (45 yy + 25 nn), marginals
    # a: 50 y / 50 n, b: 55 y / 45 n → S = 50·55 + 50·45 = 5000,
    # kappa = (70·100 − 5000)/(100² − 5000) = 2000/5000 = 0.4
    a_rows, b_rows = [], []
    i = 0
    for _ in range(45):
        a_rows.append((i, "y")); b_rows.append((i, "y")); i += 1
    for _ in range(25):
        a_rows.append((i, "n")); b_rows.append((i, "n")); i += 1
    for _ in range(5):
        a_rows.append((i, "y")); b_rows.append((i, "n")); i += 1
    for _ in range(25):
        a_rows.append((i, "n")); b_rows.append((i, "y")); i += 1
    a, b = _dfs(spark, a_rows, b_rows)
    r = cohens_kappa(a, b).collect()[0]
    assert r["n_items"] == 100 and r["n_agree"] == 70
    assert r["sum_marg"] == 5000
    assert r["agree_micro"] == 700_000
    assert r["expected_micro"] == 500_000
    assert r["kappa_micro"] == 400_000


def test_edge_cases(spark):
    # perfect agreement, non-constant labels → kappa exactly 1e6
    a, b = _dfs(spark, [(1, "x"), (2, "y")], [(1, "x"), (2, "y")])
    assert cohens_kappa(a, b).collect()[0]["kappa_micro"] == 1_000_000
    # both raters constant and identical → p_e = 1 → NULL
    a, b = _dfs(spark, [(1, "x"), (2, "x")], [(1, "x"), (2, "x")])
    assert cohens_kappa(a, b).collect()[0]["kappa_micro"] is None
    # disjoint item sets → zero rows, not a divide-by-zero
    a, b = _dfs(spark, [(1, "x")], [(2, "x")])
    assert cohens_kappa(a, b).collect() == []


def test_joint_set_and_dedup(spark):
    # item 3 only in a → excluded; duplicate labels for item 1 in b
    # dedupe to the min label deterministically
    a, b = _dfs(
        spark,
        [(1, "x"), (2, "y"), (3, "z")],
        [(1, "x"), (1, "w"), (2, "y")],
    )
    r = cohens_kappa(a, b).collect()[0]
    assert r["n_items"] == 2 and r["n_agree"] == 1  # b's item1 → 'w'


def test_matches_duckdb_oracle(spark):
    a_rows = [(i, "y" if i % 3 else "n") for i in range(30)]
    b_rows = [(i, "y" if i % 2 else "n") for i in range(30)]
    a, b = _dfs(spark, a_rows, b_rows)
    a_sql = " UNION ALL ".join(
        f"SELECT {i} AS item, '{l}' AS label" for i, l in a_rows)
    b_sql = " UNION ALL ".join(
        f"SELECT {i} AS item, '{l}' AS label" for i, l in b_rows)
    want = duckdb.connect().execute(
        cohens_kappa_oracle_sql(a_sql, b_sql)).fetchall()
    got = [tuple(r) for r in cohens_kappa(a, b).collect()]
    assert got == want and len(got) == 1
