"""Daily burst detection (operators/bursts.py): planted spike flagged,
steady series not, cross-multiply boundary exactness, DuckDB parity."""

from datetime import datetime

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.bursts import (
    daily_bursts,
    daily_bursts_oracle_sql,
)

# 'steady': 10/day over 3 days. 'spiky': 2, 2, 14 → day-3 ratio 3·14/18.
# 'boundary': 5, 5, 6 → day-3 ratio 3·6/16 = 1.125, exactly AT a 9/8
# factor → strict > must NOT flag it.
EVENTS = (
    [("steady", datetime(2024, 1, d, 9, 0, 0)) for d in (1, 2, 3) for _ in range(10)]
    + [("spiky", datetime(2024, 1, 1, 9, 0, 0))] * 2
    + [("spiky", datetime(2024, 1, 2, 9, 0, 0))] * 2
    + [("spiky", datetime(2024, 1, 3, 9, 0, 0))] * 14
    + [("boundary", datetime(2024, 1, 1, 9, 0, 0))] * 5
    + [("boundary", datetime(2024, 1, 2, 9, 0, 0))] * 5
    + [("boundary", datetime(2024, 1, 3, 9, 0, 0))] * 6
)


def _df(spark):
    return spark.createDataFrame(EVENTS, "event_type string, ts timestamp")


def test_spike_flagged_steady_not(spark):
    rows = {
        (r["event_type"], str(r["day"])): r
        for r in daily_bursts(_df(spark), factor=(6, 5)).collect()
    }
    assert rows[("spiky", "2024-01-03")]["is_burst"] is True
    assert rows[("spiky", "2024-01-03")]["ratio_micro"] == 2333333
    assert not any(
        r["is_burst"] for (t, _), r in rows.items() if t == "steady"
    )
    assert rows[("steady", "2024-01-02")]["ratio_micro"] == 1000000
    # sparse convention: no (spiky, day-4) zero row
    assert len([k for k in rows if k[0] == "spiky"]) == 3


def test_exact_boundary_not_a_burst(spark):
    rows = {
        (r["event_type"], str(r["day"])): r
        for r in daily_bursts(_df(spark), factor=(9, 8)).collect()
    }
    # 6·3·8 = 144 == 16·9 = 144 → strictly-greater test says no burst
    assert rows[("boundary", "2024-01-03")]["is_burst"] is False
    # one more event would tip it: the spiky day-3 is far past 9/8
    assert rows[("spiky", "2024-01-03")]["is_burst"] is True


def test_matches_duckdb_oracle(spark):
    events_sql = " UNION ALL ".join(
        f"SELECT '{t}' AS event_type, TIMESTAMP '{ts}' AS ts"
        for t, ts in EVENTS
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(
            daily_bursts_oracle_sql(events_sql, factor=(6, 5))
        ).fetchall()
    )
    got = sorted(
        tuple(r) for r in daily_bursts(_df(spark), factor=(6, 5)).collect()
    )
    assert got == want and len(got) == 9


def test_factor_validation(spark):
    with pytest.raises(ValueError):
        daily_bursts(_df(spark), factor=(0, 1))
