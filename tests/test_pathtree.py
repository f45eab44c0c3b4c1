"""URL path rollup (operators/pathtree.py): ancestor counting, depth
cap, query/fragment exclusion, root-only urls, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.pathtree import (
    url_path_rollup,
    url_path_rollup_sql,
)

URLS = [
    ("https://a.x/docs/api/auth",),
    ("https://a.x/docs/api/tokens?q=1#frag",),  # query/frag excluded
    ("https://a.x/docs/guide",),
    ("https://a.x/blog",),
    ("https://a.x",),                            # root only
    ("https://b.y/one/two/three/four/five",),    # deeper than cap
    ("not-a-url",),                              # no host → drops
]


def _df(spark):
    return spark.createDataFrame(URLS, "url string")


def test_rollup_counts(spark):
    rows = {(r["host"], r["prefix"]): r["n_pages"]
            for r in url_path_rollup(_df(spark), max_depth=3).collect()}
    assert rows[("a.x", "")] == 5            # every a.x page incl. root
    assert rows[("a.x", "/docs")] == 3
    assert rows[("a.x", "/docs/api")] == 2
    assert rows[("a.x", "/docs/api/auth")] == 1
    assert rows[("a.x", "/blog")] == 1
    # depth capped at 3: the 5-segment url contributes prefixes to /3
    assert rows[("b.y", "/one/two/three")] == 1
    assert ("b.y", "/one/two/three/four") not in rows
    assert not any(h == "not-a-url" for h, _ in rows)


def test_validation(spark):
    with pytest.raises(ValueError):
        url_path_rollup(_df(spark), max_depth=0)


def test_matches_duckdb_oracle(spark):
    u_sql = " UNION ALL ".join(f"SELECT '{u}' AS url" for (u,) in URLS)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(url_path_rollup_sql(u_sql, max_depth=3)).fetchall()
    )
    got = sorted(
        tuple(r) for r in url_path_rollup(_df(spark), max_depth=3).collect())
    assert got == want and len(got) > 0
