"""Tracking-parameter rule mining over a crawl — which URL query
parameters never change the fetched content? The duplicate-cluster
rule-mining idea of Dasgupta/Kumar/Sasturkar (WWW'08, "De-duping URLs
via rewrite rules"), reduced to its per-parameter form: group captures
by (url with the parameter REMOVED); a parameter is strippable when
every multi-capture group is content-clean (one distinct content hash).
The mined rules feed ``operators/urlnorm.py``'s canonicalizer — this is
how the static utm_* denylist gets replaced by evidence.

Exactness: pure string surgery (split_part / filter / sort / join — no
regex backslashes, no floats) and BIGINT counts; the verdict is
``n_multi > 0 AND n_clean = n_multi``. The residual key sorts the
remaining k=v pairs so parameter ORDER never splits a group, and the
empty-residual case coalesces to '' on DuckDB (array_to_string([]) is
NULL there, '' on Spark — the repo's documented divergence).

Scale shape at 10^12 captures: one explode per DISTINCT param key per
url (bounded by the key vocabulary of each url, typically < 10), one
(key, residual) groupBy with map-side combine carrying only
(hash-sized) group stats, one key-sized final aggregation. No joins at
all; the residual never carries page content — only the url string.

Reference anchor: the reference canonicalizes paths before indexing
(`src/aci/core/file_scanner/scanner.py` normalized path keys) — same
canonical-key discipline, learned from data here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def param_rules(
    pages: DataFrame, url_col: str = "url", hash_col: str = "content_hash"
) -> DataFrame:
    """→ (param, n_urls, n_groups, n_multi_groups, n_clean_multi,
    strippable): per query-parameter key, the residual-group evidence
    and the strip verdict. URLs without a query string contribute
    nothing (no parameters to judge)."""
    kvs = (
        f"filter(split(split_part({url_col}, '?', 2), '&'), x -> x <> '')"
    )
    exploded = (
        pages.selectExpr(
            f"split_part({url_col}, '?', 1) AS base",
            f"{kvs} AS kvs",
            f"{hash_col} AS content_hash",
        )
        .filter(F.expr("size(kvs) > 0"))
        .selectExpr(
            "base", "kvs", "content_hash",
            "explode(array_distinct(transform(kvs,"
            " x -> split_part(x, '=', 1)))) AS param",
        )
        .selectExpr(
            "param", "content_hash",
            "base || '?' || array_join(array_sort("
            "filter(kvs, x -> split_part(x, '=', 1) != param)), '&')"
            " AS residual",
        )
    )
    groups = exploded.groupBy("param", "residual").agg(
        F.count("*").cast("long").alias("n_urls_g"),
        F.countDistinct("content_hash").cast("long").alias("n_hashes_g"),
    )
    return groups.groupBy("param").agg(
        F.sum("n_urls_g").cast("long").alias("n_urls"),
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.expr("CASE WHEN n_urls_g >= 2 THEN 1 ELSE 0 END"))
        .cast("long").alias("n_multi_groups"),
        F.sum(
            F.expr(
                "CASE WHEN n_urls_g >= 2 AND n_hashes_g = 1"
                " THEN 1 ELSE 0 END"
            )
        ).cast("long").alias("n_clean_multi"),
    ).selectExpr(
        "*",
        "n_multi_groups > 0 AND n_clean_multi = n_multi_groups"
        " AS strippable",
    )


def param_rules_oracle_sql(
    pages_sql: str = "SELECT url, content_hash FROM pages",
) -> str:
    """DuckDB mirror: same surgery; list_sort/list_filter and the
    NULL-empty-join coalesce."""
    return f"""
    WITH p AS (
      SELECT split_part(url, '?', 1) AS base,
             list_filter(string_split(split_part(url, '?', 2), '&'),
                         x -> x <> '') AS kvs,
             content_hash
      FROM ({pages_sql})
      WHERE len(list_filter(string_split(split_part(url, '?', 2), '&'),
                            x -> x <> '')) > 0),
    e AS (
      SELECT unnest(list_distinct(list_transform(kvs,
               x -> split_part(x, '=', 1)))) AS param,
             base, kvs, content_hash
      FROM p),
    res AS (
      SELECT param, content_hash,
             base || '?' || coalesce(array_to_string(list_sort(
               list_filter(kvs, x -> split_part(x, '=', 1) <> param)),
               '&'), '') AS residual
      FROM e),
    groups AS (
      SELECT param, residual,
             CAST(count(*) AS BIGINT) AS n_urls_g,
             CAST(count(DISTINCT content_hash) AS BIGINT) AS n_hashes_g
      FROM res GROUP BY param, residual)
    SELECT param,
           CAST(sum(n_urls_g) AS BIGINT) AS n_urls,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN n_urls_g >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_multi_groups,
           CAST(sum(CASE WHEN n_urls_g >= 2 AND n_hashes_g = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_multi,
           sum(CASE WHEN n_urls_g >= 2 THEN 1 ELSE 0 END) > 0
             AND sum(CASE WHEN n_urls_g >= 2 THEN 1 ELSE 0 END)
                 = sum(CASE WHEN n_urls_g >= 2 AND n_hashes_g = 1
                       THEN 1 ELSE 0 END) AS strippable
    FROM groups GROUP BY param
    """
