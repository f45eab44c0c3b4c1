"""JSON-LD extraction (operators/structured.py): block extraction in
document order, field paths, malformed-block NULL surfacing, and
DuckDB parity."""

import pyspark.sql.functions as F

from augmented_codebase_indexer_spark.operators.structured import (
    extract_jsonld,
    jsonld_items,
    jsonld_items_sql,
)

GOOD = '{"@type":"Organization","name":"Acme Corp","url":"https://acme.example"}'
NONAME = '{"@type":"Person"}'
BAD = '{"@type":"Organization","name":'  # truncated — malformed
PAGES = [
    ("u1", f'<html><script type="application/ld+json">{GOOD}</script>'
           f'<p>x</p><script type="application/ld+json">{NONAME}</script></html>'),
    ("u2", f'<html><script type="application/ld+json">{BAD}</script></html>'),
    ("u3", "<html>no markup</html>"),
]


def _pages(spark):
    return spark.createDataFrame(PAGES, "url string, html_s string").select(
        "url", F.encode("html_s", "UTF-8").alias("html")
    )


def test_blocks_in_document_order(spark):
    got = {(r["url"], r["block_idx"]): r["raw"]
           for r in extract_jsonld(_pages(spark)).collect()}
    assert got == {("u1", 1): GOOD, ("u1", 2): NONAME, ("u2", 1): BAD}


def test_items_and_malformed_nulls(spark):
    got = {(r["url"], r["block_idx"]):
           (r["item_type"], r["name"], r["item_url"])
           for r in jsonld_items(extract_jsonld(_pages(spark))).collect()}
    assert got == {
        ("u1", 1): ("Organization", "Acme Corp", "https://acme.example"),
        ("u1", 2): ("Person", None, None),
        ("u2", 1): (None, None, None),  # malformed surfaces, never drops
    }


def test_duckdb_parity(spark):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE blocks_t(url VARCHAR, block_idx BIGINT, raw VARCHAR)")
    con.executemany(
        "INSERT INTO blocks_t VALUES (?, ?, ?)",
        [("u1", 1, GOOD), ("u1", 2, NONAME), ("u2", 1, BAD)],
    )
    got = sorted(map(tuple,
                     jsonld_items(extract_jsonld(_pages(spark))).collect()))
    want = sorted(map(tuple, con.execute(
        jsonld_items_sql("SELECT * FROM blocks_t")).fetchall()))
    assert got == want
