"""Hamilton crawl-budget apportionment (operators/budget.py): exact
sum-to-budget, quota property, remainder tie-break, zero/degenerate
cases, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.budget import (
    crawl_budget,
    crawl_budget_oracle_sql,
)

# N = 100 over 4 hosts; B = 17 → quotas 8.5, 4.25, 2.89, 1.36:
# bases 8,4,2,1 (15), remainders 50,25,89,36 → extra 2 slots go to
# h3 (89) and h1 (50).
COUNTS = [("h1", 50), ("h2", 25), ("h3", 17), ("h4", 8), ("h5", 0)]


def _df(spark):
    return spark.createDataFrame(COUNTS, "host string, n_pages long")


def test_allocation(spark):
    rows = {r["host"]: r for r in crawl_budget(_df(spark), 17).collect()}
    assert "h5" not in rows  # zero-count host drops
    assert rows["h1"]["alloc"] == 9 and rows["h2"]["alloc"] == 4
    assert rows["h3"]["alloc"] == 3 and rows["h4"]["alloc"] == 1
    assert sum(r["alloc"] for r in rows.values()) == 17
    # quota property: every host gets floor or ceil of its exact quota
    for h, n in COUNTS:
        if n == 0:
            continue
        lo, hi = (n * 17) // 100, (n * 17 + 99) // 100
        assert lo <= rows[h]["alloc"] <= hi


def test_budget_sums_exactly_across_budgets(spark):
    for b in (0, 1, 7, 100, 1000):
        total = sum(
            r["alloc"] for r in crawl_budget(_df(spark), b).collect())
        assert total == b


def test_remainder_tiebreak_is_host_order(spark):
    # two hosts with identical counts and B odd → the extra slot goes
    # to the lexicographically smaller host
    df = spark.createDataFrame(
        [("b", 10), ("a", 10)], "host string, n_pages long")
    rows = {r["host"]: r["alloc"] for r in crawl_budget(df, 3).collect()}
    assert rows == {"a": 2, "b": 1}


def test_validation(spark):
    with pytest.raises(ValueError):
        crawl_budget(_df(spark), -1)


def test_matches_duckdb_oracle(spark):
    c_sql = " UNION ALL ".join(
        f"SELECT '{h}' AS host, {n} AS n_pages" for h, n in COUNTS)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(crawl_budget_oracle_sql(c_sql, 17)).fetchall()
    )
    got = sorted(tuple(r) for r in crawl_budget(_df(spark), 17).collect())
    assert got == want and len(got) == 4
