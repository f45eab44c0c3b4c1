"""Heading outline (operators/outline.py): document-order positions,
nearest-shallower parent assignment, orphan h3 before any h1/h2,
DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.outline import (
    heading_outline,
    heading_outline_sql,
)

PAGES = [
    # classic tree: h1 → h2 → h3, second h2 resets the h3 parent
    ("u1", "<h1>A</h1><h2>B</h2><h3>C</h3><h2>D</h2><h3>E</h3>"),
    # orphan h3 first (parent NULL), then h1; h3 after h1 parents to it
    ("u2", "<H3 class='x'>early</H3><h1>Top</h1><h3>late</h3>"),
    # no headings at all → zero rows
    ("u3", "<p>nothing</p>"),
]


def _df(spark):
    from pyspark.sql import functions as F

    return spark.createDataFrame(PAGES, "url string, html string").select(
        "url", F.encode("html", "UTF-8").alias("html")
    )


def test_tree_assignment(spark):
    rows = {(r["url"], r["pos"]): r for r in heading_outline(_df(spark)).collect()}
    u1 = [rows[("u1", i)] for i in range(5)]
    assert [r["text"] for r in u1] == ["A", "B", "C", "D", "E"]
    assert [r["level"] for r in u1] == [1, 2, 3, 2, 3]
    assert [r["parent_pos"] for r in u1] == [None, 0, 1, 0, 3]
    assert rows[("u2", 0)]["parent_pos"] is None       # orphan h3
    assert rows[("u2", 1)]["parent_pos"] is None       # h1
    assert rows[("u2", 2)]["parent_pos"] == 1          # h3 → h1
    assert not any(u == "u3" for u, _ in rows)


def test_matches_duckdb_oracle(spark):
    p_sql = " UNION ALL ".join(
        "SELECT '{}' AS url, '{}' AS html".format(u, h.replace("'", "''"))
        for u, h in PAGES
    )
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(heading_outline_sql(p_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in heading_outline(_df(spark)).collect())
    assert got == want and len(got) == 8
