"""Object-literal typing (operators/literals.py): classification rules,
string-arithmetic decimal parsing, invalid-calendar-date fallback,
overflow caps, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.literals import (
    type_object_literals,
    type_object_literals_oracle_sql,
)

TRIPLES = [
    ("e1", "population", "12345"),
    ("e1", "negative", "-7"),
    ("e2", "rate", "12.34"),
    ("e2", "neg_rate", "-0.5"),
    ("e2", "long_frac", "1.23456789"),   # truncates to 6 dp
    ("e3", "founded", "1999-12-31"),
    ("e3", "bad_date", "1999-13-45"),    # regex passes, calendar doesn't
    ("e4", "active", "TRUE"),
    ("e4", "closed", "false"),
    ("e5", "works_at", "acme"),
    ("e5", "semver", "1.2.3"),           # not a decimal → entity
    ("e6", "huge", "9" * 19),            # past the 18-digit cap → entity
    ("e6", "empty", ""),
]


def _df(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def test_typing_rules(spark):
    got = {
        (r["subj"], r["pred"]): r
        for r in type_object_literals(_df(spark)).collect()
    }
    assert got[("e1", "population")]["obj_type"] == "integer"
    assert got[("e1", "population")]["num_micro"] == 12345_000000
    assert got[("e1", "negative")]["num_micro"] == -7_000000
    assert got[("e2", "rate")]["num_micro"] == 12_340000
    assert got[("e2", "neg_rate")]["num_micro"] == -500000
    assert got[("e2", "long_frac")]["num_micro"] == 1_234567  # truncated
    d = got[("e3", "founded")]
    assert d["obj_type"] == "date" and d["day_epoch"] == 10956
    assert got[("e3", "bad_date")]["obj_type"] == "entity"
    assert got[("e4", "active")]["bool_val"] is True
    assert got[("e4", "closed")]["bool_val"] is False
    for k in (("e5", "works_at"), ("e5", "semver"), ("e6", "huge"),
              ("e6", "empty")):
        assert got[k]["obj_type"] == "entity", k
        assert got[k]["num_micro"] is None


def test_matches_duckdb_oracle(spark):
    triples_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in TRIPLES
    )
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        type_object_literals_oracle_sql(triples_sql)).fetchall())
    got = sorted(tuple(r) for r in type_object_literals(_df(spark)).collect())
    assert got == want
