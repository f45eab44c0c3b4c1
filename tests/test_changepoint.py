"""CUSUM (operators/changepoint.py): hand recursion values via the
prefix-sum identity, detection delay, stable series never alarms,
computed-mean path, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.changepoint import (
    MICRO,
    cusum_alarms,
    cusum_alarms_oracle_sql,
)

# level shift of +10 at day 5 on series b; series a stays flat
DAILY = (
    [("a", d, 10) for d in range(1, 8)]
    + [("b", d, 10) for d in range(1, 5)]
    + [("b", d, 20) for d in range(5, 8)]
)


def _df(spark):
    return spark.createDataFrame(DAILY, "series string, day long, cnt long")


def test_hand_recursion_explicit_mu(spark):
    rows = {(r["series"], r["day"]): r for r in cusum_alarms(
        _df(spark), k_micro=2 * MICRO, h_micro=15 * MICRO,
        mu_micro=10 * MICRO).collect()}
    # hand recursion for b: dev = cnt-10-2 -> [-2]*4 + [8]*3
    # S: 0,0,0,0, 8,16,24  -> alarms at days 6,7 (delay 2)
    want_s = {1: 0, 2: 0, 3: 0, 4: 0, 5: 8, 6: 16, 7: 24}
    for d, s in want_s.items():
        assert rows[("b", d)]["cusum_micro"] == s * MICRO
        assert rows[("b", d)]["alarm"] is (s >= 15)
    # flat series never accumulates
    assert all(rows[("a", d)]["cusum_micro"] == 0 for d in range(1, 8))


def test_computed_mean_still_detects(spark):
    rows = {(r["series"], r["day"]): r
            for r in cusum_alarms(_df(spark), h_micro=10 * MICRO).collect()}
    # b's over-all mean ~ 14.28: post-shift deviations +5.7/day
    assert rows[("b", 7)]["alarm"] is True
    assert not any(rows[("a", d)]["alarm"] for d in range(1, 8))


def test_matches_duckdb_oracle(spark):
    d_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS series, {d} AS day, {c} AS cnt"
        for s, d, c in DAILY)
    con = duckdb.connect()
    for kwargs in ({"mu_micro": 10 * MICRO, "k_micro": 2 * MICRO},
                   {}):
        want = sorted(tuple(r) for r in con.execute(
            cusum_alarms_oracle_sql(d_sql, **kwargs)).fetchall())
        got = sorted(tuple(r) for r in cusum_alarms(
            _df(spark), **kwargs).collect())
        assert got == want


def test_ks_hand_values(spark):
    from augmented_codebase_indexer_spark.operators.changepoint import (
        ks_drift,
    )

    # A = {1,2,3,4}, B = {3,4,5,6}: max |F_a - F_b| = 1/2 at s=2
    a = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "score long")
    b = spark.createDataFrame([(v,) for v in (3, 4, 5, 6)], "score long")
    r = ks_drift(a, b).collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["ks_micro"] == MICRO // 2 and r["at_score"] == 2
    # identical distributions -> 0
    same = ks_drift(a, a).collect()[0]
    assert same["ks_micro"] == 0


def test_ks_matches_duckdb_oracle(spark):
    from augmented_codebase_indexer_spark.operators.changepoint import (
        ks_drift,
        ks_drift_oracle_sql,
    )

    A = [1, 2, 2, 3, 7, 7, 9]
    B = [2, 3, 3, 8, 9, 9]
    a_sql = " UNION ALL ".join(f"SELECT {v} AS score" for v in A)
    b_sql = " UNION ALL ".join(f"SELECT {v} AS score" for v in B)
    want = duckdb.connect().execute(
        ks_drift_oracle_sql(a_sql, b_sql)).fetchall()[0]
    a = spark.createDataFrame([(v,) for v in A], "score long")
    b = spark.createDataFrame([(v,) for v in B], "score long")
    got = tuple(ks_drift(a, b).collect()[0])
    assert got == tuple(want)
