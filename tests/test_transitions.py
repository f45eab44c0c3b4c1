"""Event transitions (operators/transitions.py): planted chains, no
cross-user pairs, equal-timestamp tiebreak determinism, DuckDB parity."""

from datetime import datetime

import duckdb

from augmented_codebase_indexer_spark.operators.transitions import (
    event_transitions,
    event_transitions_oracle_sql,
)

T = datetime(2024, 1, 1, 9, 0, 0)

# u1: view → click → view → purchase; u2: view → error.
# u3: two events at the SAME timestamp → event_id breaks the tie
# (7 before 8: click → view, never view → click).
EVENTS = [
    (1, 1, "view", datetime(2024, 1, 1, 9, 0, 0)),
    (2, 1, "click", datetime(2024, 1, 1, 9, 1, 0)),
    (3, 1, "view", datetime(2024, 1, 1, 9, 2, 0)),
    (4, 1, "purchase", datetime(2024, 1, 1, 9, 3, 0)),
    (5, 2, "view", datetime(2024, 1, 1, 10, 0, 0)),
    (6, 2, "error", datetime(2024, 1, 1, 10, 5, 0)),
    (7, 3, "click", T),
    (8, 3, "view", T),
]


def _df(spark):
    return spark.createDataFrame(
        EVENTS, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_planted_transitions(spark):
    rows = {
        (r["from_type"], r["to_type"]): r
        for r in event_transitions(_df(spark)).collect()
    }
    # u1 contributes view→click, click→view, view→purchase; u2 view→error;
    # u3 click→view (tiebreak on event_id)
    assert rows[("view", "click")]["n"] == 1
    assert rows[("click", "view")]["n"] == 2
    assert rows[("view", "purchase")]["n"] == 1
    assert rows[("view", "error")]["n"] == 1
    assert ("purchase", "view") not in rows  # no cross-user pair u1→u2
    assert ("view", "click") != ("click", "view") and len(rows) == 4
    # margins: from view 3 transitions → p = 333333 each (truncated)
    assert rows[("view", "click")]["n_from"] == 3
    assert rows[("view", "click")]["p_micro"] == 333_333
    assert rows[("click", "view")]["p_micro"] == 1_000_000


def test_matches_duckdb_oracle(spark):
    events_sql = " UNION ALL ".join(
        f"SELECT {e} AS event_id, {u} AS user_id, '{t}' AS event_type, "
        f"TIMESTAMP '{ts}' AS ts"
        for e, u, t, ts in EVENTS
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(event_transitions_oracle_sql(events_sql))
        .fetchall()
    )
    got = sorted(tuple(r) for r in event_transitions(_df(spark)).collect())
    assert got == want and len(got) == 4
