"""Ordered funnel analysis (operators/funnel.py): strict ordering,
earliest-completion semantics, horizon cap, vanish-proof partial
completions, DuckDB parity."""

from datetime import datetime

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.funnel import (
    funnel_analysis,
    funnel_oracle_sql,
)


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s)


# u1 completes in order; u2 clicked BEFORE signup (order violation →
# stuck at step 1); u3 signup+click only; u4 never signed up (absent);
# u5 completes but outside a 10s horizon
EVENTS = [
    (1, "signup", _t(10)), (1, "click", _t(20)), (1, "purchase", _t(30)),
    (1, "click", _t(5)),   # pre-signup click must not count
    (2, "click", _t(10)), (2, "signup", _t(20)), (2, "purchase", _t(5)),
    (3, "signup", _t(1)), (3, "click", _t(2)),
    (4, "click", _t(1)), (4, "purchase", _t(2)),
    (5, "signup", _t(0)), (5, "click", _t(40)), (5, "purchase", _t(50)),
]

STEPS = ["signup", "click", "purchase"]


def _df(spark):
    return spark.createDataFrame(
        EVENTS, "user_id long, event_type string, ts timestamp"
    )


def test_strict_order_and_earliest(spark):
    got = {r["user_id"]: r for r in funnel_analysis(_df(spark), STEPS).collect()}
    # epoch seconds for 2024-01-01 00:00:10 = 1704067210
    assert got[1]["steps_done"] == 3
    assert got[1]["t_done"] - got[1]["t_step1"] == 20
    # u2: click(10) < signup(20), purchase(5) < signup → stuck at 1
    assert got[2]["steps_done"] == 1 and got[2]["t_done"] is None
    assert got[3]["steps_done"] == 2 and got[3]["t_done"] is None
    assert 4 not in got  # never entered the funnel
    assert got[5]["steps_done"] == 3


def test_horizon_cap(spark):
    got = {
        r["user_id"]: r
        for r in funnel_analysis(_df(spark), STEPS, horizon_s=10).collect()
    }
    # u1 finishes within 20s of entry > 10s horizon → purchase out
    assert got[1]["steps_done"] == 2
    # u5's click at +40s breaches the horizon → stuck at 1
    assert got[5]["steps_done"] == 1
    # u3's 2-step run is within horizon
    assert got[3]["steps_done"] == 2


def test_matches_duckdb_oracle(spark):
    events_sql = " UNION ALL ".join(
        f"SELECT {u} AS user_id, '{t}' AS event_type, "
        f"TIMESTAMP '{ts}' AS ts"
        for u, t, ts in EVENTS
    )
    con = duckdb.connect()
    for hz in (None, 10):
        want = sorted(tuple(r) for r in con.execute(
            funnel_oracle_sql(events_sql, STEPS, horizon_s=hz)).fetchall())
        got = sorted(tuple(r) for r in funnel_analysis(
            _df(spark), STEPS, horizon_s=hz).collect())
        assert got == want, hz


def test_step_validation(spark):
    with pytest.raises(ValueError):
        funnel_analysis(_df(spark), ["signup"])
