"""AMIE-lite rule mining (operators/rules.py): hand-planted synonym
rule with PCA vs std confidence divergence, direction asymmetry,
min_support pruning, python mirror, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.rules import (
    mine_pair_rules,
    mine_pair_rules_oracle_sql,
    mine_pair_rules_py,
)

# works_at ⇒ employer on 2 of 3 works_at pairs; s3 has NO employer
# facts at all, so PCA ignores it: std conf 2/3, PCA conf 2/2.
# The reverse rule employer ⇒ works_at has conf 2/2 (both employer
# pairs are also works_at pairs).
TRIPLES = [
    ("s1", "works_at", "acme"), ("s1", "employer", "acme"),
    ("s2", "works_at", "globex"), ("s2", "employer", "globex"),
    ("s3", "works_at", "initech"),
    ("s1", "lives_in", "berlin"),
    ("s1", "works_at", "acme"),  # dup collapses (set semantics)
]


def _df(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string")


def test_pca_vs_std_confidence(spark):
    rows = {(r["body_pred"], r["head_pred"]): r
            for r in mine_pair_rules(_df(spark), min_support=2).collect()}
    wa = rows[("works_at", "employer")]
    assert wa["n_support"] == 2 and wa["n_body"] == 3
    assert wa["n_pca"] == 2            # s3 has no employer fact
    assert wa["conf_micro"] == 666_666
    assert wa["pca_micro"] == 1_000_000
    em = rows[("employer", "works_at")]
    assert em["n_support"] == 2 and em["n_body"] == 2
    assert em["conf_micro"] == 1_000_000
    # lives_in co-occurs with nothing on the same pair → no rule
    assert not any(b == "lives_in" for b, _ in rows)


def test_python_mirror_and_min_support(spark):
    got = sorted(
        tuple(r) for r in mine_pair_rules(_df(spark), min_support=1).collect()
    )
    assert got == mine_pair_rules_py(TRIPLES, min_support=1)
    high = mine_pair_rules(_df(spark), min_support=3).collect()
    assert high == []
    with pytest.raises(ValueError):
        mine_pair_rules(_df(spark), min_support=0)


def test_matches_duckdb_oracle(spark):
    t_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in TRIPLES)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(mine_pair_rules_oracle_sql(t_sql, min_support=1))
        .fetchall()
    )
    got = sorted(
        tuple(r) for r in mine_pair_rules(_df(spark), min_support=1).collect())
    assert got == want and len(got) > 0
