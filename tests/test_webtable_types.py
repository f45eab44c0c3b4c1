"""Web-table column typing (operators/webtables.py::column_types):
majority verdicts per header, strict-majority 'mixed' gate, tie-break,
DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.webtables import (
    column_types,
    column_types_sql,
)

# 'age': 3 integers of 4 → strict majority integer.
# 'name': all entity.  'score': 2 decimal vs 2 integer → mixed.
# 'flag': exactly half bool → NOT a strict majority → mixed.
RELS = [
    ("u1", 1, 2, "age", "34"), ("u1", 1, 3, "age", "41"),
    ("u2", 1, 2, "age", "7"), ("u2", 1, 3, "age", "n/a"),
    ("u1", 1, 2, "name", "Ada"), ("u2", 1, 2, "name", "Bob"),
    ("u1", 1, 2, "score", "1.5"), ("u1", 1, 3, "score", "2.25"),
    ("u2", 1, 2, "score", "3"), ("u2", 1, 3, "score", "4"),
    ("u1", 1, 2, "flag", "true"), ("u1", 1, 3, "flag", "maybe"),
]


def _df(spark):
    return spark.createDataFrame(
        RELS,
        "url string, table_idx long, row_idx long, header string, value string",
    )


def test_majority_verdicts(spark):
    rows = {r["header"]: r for r in column_types(_df(spark)).collect()}
    age = rows["age"]
    assert age["n_values"] == 4 and age["top_type"] == "integer"
    assert age["n_top"] == 3 and age["majority_type"] == "integer"
    assert rows["name"]["majority_type"] == "entity"
    # 2 decimal vs 2 integer: tie → min-struct picks 'decimal'
    # (lexicographic), but 2·2 = 4 is not > 4 → mixed
    sc = rows["score"]
    assert sc["top_type"] == "decimal" and sc["majority_type"] == "mixed"
    # exactly half bool → mixed (strict majority required)
    assert rows["flag"]["majority_type"] == "mixed"


def test_matches_duckdb_oracle(spark):
    rel_sql = " UNION ALL ".join(
        f"SELECT '{u}' AS url, {t} AS table_idx, {r} AS row_idx, "
        f"'{h}' AS header, '{v}' AS value"
        for u, t, r, h, v in RELS
    )
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(column_types_sql(rel_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in column_types(_df(spark)).collect())
    assert got == want and len(got) == 4
