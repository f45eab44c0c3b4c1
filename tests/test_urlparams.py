"""Tracking-param rule mining (operators/urlparams.py): strippable
tracker found, content param kept, order-insensitive residuals,
no-query urls ignored, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.urlparams import (
    param_rules,
    param_rules_oracle_sql,
)

# utm varies within same-content groups → strippable.
# id: same residual, different content → NOT strippable.
# ref appears once per residual group (singleton groups only) → no
# multi-group evidence → NOT strippable.
# Param order flipped on one capture must not split utm's groups.
PAGES = [
    ("https://a.example/p1?id=1&utm=x", "h1"),
    ("https://a.example/p1?utm=y&id=1", "h1"),   # order flipped, same content
    ("https://a.example/p1?id=2&utm=x", "h2"),
    ("https://a.example/p1?id=2&utm=z", "h2"),
    ("https://a.example/p2?id=1&ref=r1", "h3"),
    ("https://a.example/p2?id=2&ref=r2", "h4"),
    ("https://a.example/plain", "h5"),           # no query → contributes nothing
]


def _df(spark):
    return spark.createDataFrame(PAGES, "url string, content_hash string")


def test_verdicts(spark):
    rows = {r["param"]: r for r in param_rules(_df(spark)).collect()}
    assert set(rows) == {"id", "utm", "ref"}
    # utm: residuals p1?id=1 (2 urls, 1 hash) and p1?id=2 (2 urls, 1 hash)
    u = rows["utm"]
    assert u["n_multi_groups"] == 2 and u["n_clean_multi"] == 2
    assert u["strippable"] is True
    # id: residual p1?utm=x has h1+h2 (dirty); p2?ref groups are singletons
    i = rows["id"]
    assert i["n_clean_multi"] < i["n_multi_groups"] or i["n_multi_groups"] == 0
    assert i["strippable"] is False
    # ref: only singleton groups → no evidence → not strippable
    assert rows["ref"]["n_multi_groups"] == 0
    assert rows["ref"]["strippable"] is False


def test_order_insensitive_residual(spark):
    # the flipped-order capture lands in the same utm residual group
    rows = {r["param"]: r for r in param_rules(_df(spark)).collect()}
    assert rows["utm"]["n_urls"] == 4
    assert rows["utm"]["n_groups"] == 2


def test_matches_duckdb_oracle(spark):
    pages_sql = " UNION ALL ".join(
        f"SELECT '{u}' AS url, '{h}' AS content_hash" for u, h in PAGES
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(param_rules_oracle_sql(pages_sql))
        .fetchall()
    )
    got = sorted(tuple(r) for r in param_rules(_df(spark)).collect())
    assert got == want and len(got) == 3
