"""hreflang alternates + reciprocity (operators/hreflang.py):
extraction with both attribute orders, malformed drop, reciprocity
verdicts incl. self-reference, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.hreflang import (
    hreflang_alternates,
    hreflang_reciprocity,
    hreflang_reciprocity_sql,
)

PAGES = [
    # A declares B (de) and itself (en) — B declares A back → all good
    ("A", '<link rel="alternate" hreflang="de" href="B">'
          '<link rel="alternate" hreflang="en" href="A">'),
    ("B", '<link hreflang="en" href="A" rel="alternate">'),  # order flip
    # C declares D but D declares nothing → violation
    ("C", '<link rel="alternate" hreflang="FR" href="D">'),
    ("D", "<p>no alternates</p>"),
    # malformed: missing href → dropped
    ("E", '<link rel="alternate" hreflang="es">'),
]


def _df(spark):
    from pyspark.sql import functions as F

    return spark.createDataFrame(PAGES, "url string, html string").select(
        "url", F.encode("html", "UTF-8").alias("html")
    )


def test_extraction_and_reciprocity(spark):
    alts = hreflang_alternates(_df(spark))
    rows = {(r["url"], r["alt_url"]): r
            for r in hreflang_reciprocity(alts).collect()}
    assert rows[("A", "B")]["reciprocal"] is True
    assert rows[("A", "A")]["reciprocal"] is True   # self-reference
    assert rows[("B", "A")]["reciprocal"] is True
    c = rows[("C", "D")]
    assert c["reciprocal"] is False and c["hreflang"] == "fr"  # lowered
    assert not any(u == "E" for u, _ in rows)       # malformed dropped
    assert len(rows) == 4


def test_matches_duckdb_oracle(spark):
    p_sql = " UNION ALL ".join(
        "SELECT '{}' AS url, '{}' AS html".format(u, h.replace("'", "''"))
        for u, h in PAGES
    )
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(hreflang_reciprocity_sql(p_sql)).fetchall()
    )
    got = sorted(
        tuple(r)
        for r in hreflang_reciprocity(hreflang_alternates(_df(spark)))
        .collect()
    )
    assert got == want and len(got) == 4
