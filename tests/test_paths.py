"""Property paths (operators/paths.py): each combinator, nesting,
bounded closure saturation, cross-engine parity of the compiled AST."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.paths import (
    eval_path,
    eval_path_sql,
)

FACTS = [
    ("p1", "works_at", "acme"), ("p2", "works_at", "acme"),
    ("p3", "works_at", "globex"),
    ("acme", "part_of", "mega"), ("mega", "part_of", "ultra"),
    ("globex", "part_of", "mega"),
    ("p1", "lives_in", "paris"),
]


def _df(spark):
    return spark.createDataFrame(FACTS, "subj string, pred string, obj string")


def _pairs(spark, path):
    return {(r["subj"], r["obj"])
            for r in eval_path(_df(spark), path).collect()}


def test_combinators(spark):
    assert _pairs(spark, ("pred", "lives_in")) == {("p1", "paris")}
    assert _pairs(spark, ("inv", ("pred", "lives_in"))) == {("paris", "p1")}
    # coworkers: works_at/^works_at (includes self-pairs, set semantics)
    assert _pairs(spark, ("seq", ("pred", "works_at"),
                          ("inv", ("pred", "works_at")))) == {
        ("p1", "p1"), ("p1", "p2"), ("p2", "p1"), ("p2", "p2"),
        ("p3", "p3")}
    assert _pairs(spark, ("alt", ("pred", "lives_in"),
                          ("pred", "works_at"))) == {
        ("p1", "paris"), ("p1", "acme"), ("p2", "acme"), ("p3", "globex")}
    # bounded closure; k=3 saturates at the same set as k=2
    anc2 = _pairs(spark, ("plus", ("pred", "part_of"), 2))
    assert anc2 == {("acme", "mega"), ("mega", "ultra"),
                    ("globex", "mega"), ("acme", "ultra"),
                    ("globex", "ultra")}
    assert _pairs(spark, ("plus", ("pred", "part_of"), 3)) == anc2
    # nesting: employer's ancestors
    assert _pairs(spark, ("seq", ("pred", "works_at"),
                          ("plus", ("pred", "part_of"), 2))) == {
        ("p1", "mega"), ("p1", "ultra"), ("p2", "mega"), ("p2", "ultra"),
        ("p3", "mega"), ("p3", "ultra")}


def test_unknown_op_rejected(spark):
    with pytest.raises(ValueError):
        eval_path(_df(spark), ("star", ("pred", "x")))


def test_compiled_sql_parity(spark):
    f_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in FACTS)
    paths = [
        ("pred", "works_at"),
        ("seq", ("pred", "works_at"), ("inv", ("pred", "works_at"))),
        ("alt", ("seq", ("pred", "works_at"),
                 ("plus", ("pred", "part_of"), 2)),
         ("pred", "lives_in")),
    ]
    con = duckdb.connect()
    for path in paths:
        want = sorted(con.execute(eval_path_sql(f_sql, path)).fetchall())
        got = sorted((r["subj"], r["obj"])
                     for r in eval_path(_df(spark), path).collect())
        assert got == want, path
