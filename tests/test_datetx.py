"""Prose date normalization (operators/datetx.py): all three frames,
calendar-invalid drop, leap day, multi-date docs."""

import datetime

from augmented_codebase_indexer_spark.operators.datetx import extract_dates

EPOCH = datetime.date(1970, 1, 1)


def _d(y, m, d):
    return (datetime.date(y, m, d) - EPOCH).days

DOCS = [
    (1, "released on January 5, 2026 worldwide."),
    (2, "the event of 5 January 2026 repeated on 2026-02-28."),
    (3, "February 30, 2021 never happened."),        # calendar-invalid
    (4, "leap day February 29, 2024 was real."),
    (5, "but February 29, 2023 was not."),           # non-leap -> drop
    (6, "from March 1, 2020 to 15 April 2021 and 1999-12-31."),
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        (r["doc_id"], r["mention"], r["day_epoch"], r["fmt"])
        for r in extract_dates(df).collect()
    }


def test_frames_and_calendar_gate(spark):
    assert _run(spark) == {
        (1, "January 5, 2026", _d(2026, 1, 5), "mdy_text"),
        (2, "5 January 2026", _d(2026, 1, 5), "dmy_text"),
        (2, "2026-02-28", _d(2026, 2, 28), "iso"),
        (4, "February 29, 2024", _d(2024, 2, 29), "mdy_text"),
        (6, "March 1, 2020", _d(2020, 3, 1), "mdy_text"),
        (6, "15 April 2021", _d(2021, 4, 15), "dmy_text"),
        (6, "1999-12-31", _d(1999, 12, 31), "iso"),
    }
