"""Page metadata (operators/pagemeta.py): title/canonical/robots/
refresh extraction, attribute-order flip, protocol defaults, DuckDB
regex parity on the same html strings."""

import duckdb

from augmented_codebase_indexer_spark.operators.pagemeta import (
    page_meta,
    page_meta_sql,
)

PAGES = [
    ("u1", '<html><head><title>Hello World</title>'
           '<link rel="canonical" href="https://e.x/a"/>'
           '<meta name="robots" content="NOINDEX, nofollow">'
           '</head></html>'),
    # href before rel; refresh redirect; no robots meta → defaults false
    ("u2", '<head><TITLE>Two</TITLE>'
           '<link href="https://e.x/b" rel="canonical">'
           '<meta http-equiv="refresh" content="0; url=https://e.x/c">'
           '</head>'),
    # nothing extractable
    ("u3", "<html><body>plain</body></html>"),
    # noindex only, case-insensitive tag names
    ("u4", '<META NAME="robots" CONTENT="noindex">'),
]


def _df(spark):
    from pyspark.sql import functions as F

    return spark.createDataFrame(PAGES, "url string, html string").select(
        "url", F.encode("html", "UTF-8").alias("html")
    )


def test_extraction(spark):
    rows = {r["url"]: r for r in page_meta(_df(spark)).collect()}
    u1 = rows["u1"]
    assert u1["title"] == "Hello World"
    assert u1["canonical"] == "https://e.x/a"
    assert u1["noindex"] is True and u1["nofollow"] is True
    assert u1["refresh_url"] is None
    u2 = rows["u2"]
    assert u2["title"] == "Two"
    assert u2["canonical"] == "https://e.x/b"  # href-first order
    assert u2["noindex"] is False and u2["nofollow"] is False
    assert u2["refresh_url"] == "https://e.x/c"
    u3 = rows["u3"]
    assert u3["title"] is None and u3["canonical"] is None
    assert u3["noindex"] is False
    assert rows["u4"]["noindex"] is True and rows["u4"]["nofollow"] is False


def test_matches_duckdb_oracle(spark):
    p_sql = " UNION ALL ".join(
        "SELECT '{}' AS url, '{}' AS html".format(u, h.replace("'", "''"))
        for u, h in PAGES
    )
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(page_meta_sql(p_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in page_meta(_df(spark)).collect())
    assert got == want and len(got) == 4


def test_canonical_edges_chain_resolution(spark):
    # canonical chains collapse like redirect chains: A→B→C ⇒ A's
    # clean form is C (2 hops); self-canonical D drops from the edges
    from augmented_codebase_indexer_spark.operators.pagemeta import (
        canonical_edges,
        page_meta,
    )
    from augmented_codebase_indexer_spark.operators.redirects import (
        resolve_redirects,
    )
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [
            ("A", '<link rel="canonical" href="B">'),
            ("B", '<link rel="canonical" href="C">'),
            ("C", "<p>terminal</p>"),
            ("D", '<link rel="canonical" href="D">'),
        ],
        "url string, html string",
    ).select("url", F.encode("html", "UTF-8").alias("html"))
    edges = canonical_edges(page_meta(pages))
    assert sorted(tuple(r) for r in edges.collect()) == [
        ("A", "B"), ("B", "C")]
    res = {r["src"]: r for r in resolve_redirects(edges).collect()}
    assert res["A"]["terminal"] == "C" and res["A"]["hops"] == 2
    assert res["B"]["terminal"] == "C" and res["B"]["hops"] == 1
