"""Span-union coverage (operators/coverage.py): overlap never
overcounts, clipping at doc edges, degenerate spans, zero-length docs,
DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.coverage import (
    span_coverage,
    span_coverage_oracle_sql,
)

# doc 1 (100): [0,10) ∪ [5,20) ∪ [5,20) dup ∪ [30,40) = 30 covered.
# doc 2 (50): [40,80) clips to [40,50) = 10; [7,7) degenerate = 0.
# doc 3 (0 tokens): spans clip to nothing, share 0 not an error.
SPANS = [
    (1, 0, 10), (1, 5, 20), (1, 5, 20), (1, 30, 40),
    (2, 40, 80), (2, 7, 7),
    (3, 0, 5),
]
TOKENS = [(1, 100), (2, 50), (3, 0)]


def _dfs(spark):
    sp = spark.createDataFrame(SPANS, "doc_id long, s long, e long")
    t = spark.createDataFrame(TOKENS, "doc_id long, n_tokens long")
    return sp, t


def test_union_clipping_degenerate(spark):
    sp, t = _dfs(spark)
    rows = {r["doc_id"]: r for r in span_coverage(sp, t).collect()}
    assert rows[1]["covered"] == 30 and rows[1]["n_spans"] == 4
    assert rows[1]["share_micro"] == 300_000
    assert rows[2]["covered"] == 10 and rows[2]["n_spans"] == 2
    assert rows[2]["share_micro"] == 200_000
    assert rows[3]["covered"] == 0 and rows[3]["share_micro"] == 0


def test_full_overlap_is_capped_at_one(spark):
    # spans covering everything twice → share exactly 1e6, never more
    sp = spark.createDataFrame(
        [(1, 0, 10), (1, 0, 10), (1, 0, 99)], "doc_id long, s long, e long"
    )
    t = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    r = span_coverage(sp, t).collect()[0]
    assert r["covered"] == 10 and r["share_micro"] == 1_000_000


def test_matches_duckdb_oracle(spark):
    sp, t = _dfs(spark)
    sp_sql = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, {s} AS s, {e} AS e" for d, s, e in SPANS
    )
    t_sql = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, {n} AS n_tokens" for d, n in TOKENS
    )
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(span_coverage_oracle_sql(sp_sql, t_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in span_coverage(sp, t).collect())
    assert got == want and len(got) == 3
