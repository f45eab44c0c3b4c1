"""Web-table extraction (operators/webtables.py): cell indexing,
attribute-carrying tags, multi-table pages, ragged rows, relation
recovery, and DuckDB parity."""

import pyspark.sql.functions as F

from augmented_codebase_indexer_spark.operators.webtables import (
    extract_table_cells,
    table_relations,
    table_relations_sql,
)

HTML1 = (
    '<html><table class="t"><tr><th>name</th><th>role</th></tr>'
    "<tr><td>Acme</td><td>vendor</td></tr>"
    "<tr><td>Beta</td><td>client</td><td>EXTRA</td></tr></table>"
    '<table><tr><td> solo </td></tr></table></html>'
)


def _pages(spark):
    return spark.createDataFrame(
        [("u1", HTML1), ("u2", "<html>no tables</html>")],
        "url string, html_s string",
    ).select("url", F.encode("html_s", "UTF-8").alias("html"))


def test_cell_indexing(spark):
    got = {
        (r["url"], r["table_idx"], r["row_idx"], r["col_idx"]): r["cell"]
        for r in extract_table_cells(_pages(spark)).collect()
    }
    assert got == {
        ("u1", 1, 1, 1): "name", ("u1", 1, 1, 2): "role",
        ("u1", 1, 2, 1): "Acme", ("u1", 1, 2, 2): "vendor",
        ("u1", 1, 3, 1): "Beta", ("u1", 1, 3, 2): "client",
        ("u1", 1, 3, 3): "EXTRA",
        ("u1", 2, 1, 1): "solo",  # trimmed
    }


def test_relation_recovery_drops_ragged_tail(spark):
    rel = table_relations(extract_table_cells(_pages(spark)))
    got = {(r["table_idx"], r["row_idx"], r["header"]): r["value"]
           for r in rel.collect()}
    assert got == {
        (1, 2, "name"): "Acme", (1, 2, "role"): "vendor",
        (1, 3, "name"): "Beta", (1, 3, "role"): "client",
        # col 3 has no header → EXTRA dropped (ragged row)
    }


def test_duckdb_parity(spark):
    import duckdb

    cells = extract_table_cells(_pages(spark))
    lit = " UNION ALL ".join(
        f"SELECT '{r['url']}' AS url, {r['table_idx']} AS table_idx, "
        f"{r['row_idx']} AS row_idx, {r['col_idx']} AS col_idx, "
        f"'{r['cell']}' AS cell"
        for r in cells.collect()
    )
    got = sorted(map(tuple, table_relations(cells).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        table_relations_sql(lit)).fetchall()))
    assert got == want
