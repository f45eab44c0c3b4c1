"""Predicate alignment (operators/predalign.py): planted synonym pair
aligns, partial overlap below threshold doesn't, disjoint pair absent,
exact boundary, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.predalign import (
    predicate_alignment,
    predicate_alignment_oracle_sql,
)

# works_at ≡ employer on 3 of 4 edges; located_in shares ONE edge with
# works_at (org ids colliding with city ids); born_in fully disjoint
TRIPLES = [
    ("a", "works_at", "acme"), ("b", "works_at", "acme"),
    ("c", "works_at", "globex"), ("d", "works_at", "initech"),
    ("a", "employer", "acme"), ("b", "employer", "acme"),
    ("c", "employer", "globex"),
    ("a", "located_in", "acme"),  # one accidental shared pair
    ("a", "born_in", "paris"), ("b", "born_in", "lyon"),
    ("a", "works_at", "acme"),  # duplicate collapses
]


def _df(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def test_alignment_verdicts(spark):
    rows = {
        (r["pred_a"], r["pred_b"]): r
        for r in predicate_alignment(_df(spark), threshold=(1, 2)).collect()
    }
    syn = rows[("employer", "works_at")]
    # |A∩B|=3, |A∪B|=4 → jaccard 0.75 > 1/2
    assert (syn["n_common"], syn["n_a"], syn["n_b"]) == (3, 3, 4)
    assert syn["jaccard_micro"] == 750000 and syn["aligned"] is True
    acc = rows[("located_in", "works_at")]
    # 1 of 4 → 0.25 < 1/2
    assert acc["jaccard_micro"] == 250000 and acc["aligned"] is False
    # disjoint predicates never surface
    assert not any("born_in" in k for k in rows)


def test_exact_boundary_strict(spark):
    # employer vs located_in: common=1, union=3+1-1=3 → exactly 1/3:
    # the strictly-greater test must NOT align it at threshold 1/3
    rows = {
        (r["pred_a"], r["pred_b"]): r["aligned"]
        for r in predicate_alignment(_df(spark), threshold=(1, 3)).collect()
    }
    assert rows[("employer", "located_in")] is False  # strict >
    assert rows[("employer", "works_at")] is True


def test_matches_duckdb_oracle(spark):
    triples_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in TRIPLES
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        predicate_alignment_oracle_sql(triples_sql, threshold=(1, 2))
    ).fetchall())
    got = sorted(tuple(r) for r in predicate_alignment(
        _df(spark), threshold=(1, 2)).collect())
    assert got == want and len(got) == 3


def test_threshold_validation(spark):
    with pytest.raises(ValueError):
        predicate_alignment(_df(spark), threshold=(0, 1))
