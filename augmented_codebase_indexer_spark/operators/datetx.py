"""Temporal expression normalization — prose date mentions → ISO epoch
days (the TIMEX2/TimeML 'TIMEX-lite' tier).

Fact temporal scoping needs dates as they appear in WEB PROSE, not
just as typed literals (`operators/literals.py` handles the latter):
``January 5, 2026`` / ``5 January 2026`` / inline ``2026-01-05``. The
rule-based tier of every TIMEX normalizer (TimeML/TIMEX2; SUTime,
Chang & Manning LREC'12 — its 'absolute date' rule family) covers the
three unambiguous absolute-date frames; slash dates (``05/01/2026``)
are EXCLUDED by design — MDY/DMY ambiguity makes them locale
guesses, not normalizations.

Calendar validation is delegated to ``try_cast(... AS DATE)``: a
mention that matches the shape but not the calendar (February 30) is
DROPPED, not guessed — both engines validate identically (probed in
`operators/literals.py`).

Output: (doc, mention, day_epoch, fmt) with ``day_epoch`` = days since
1970-01-01 as BIGINT and ``fmt`` ∈ {mdy_text, dmy_text, iso}; one row
per match, a doc with three dates yields three rows.

Engine shape: per frame one ``regexp_extract_all`` (escape-free
pattern: month alternation + digit classes, no backslash in the SQL
literal) + nested ``zip_with`` + explode + codegen month map — no UDF,
no shuffle; page text never leaves the scan.

Reference anchor: the reference stamps chunks with commit timestamps
(`core/indexer`); this recovers the in-text assertion dates webtext
carries instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MONTHS = ("January", "February", "March", "April", "May", "June",
           "July", "August", "September", "October", "November",
           "December")
_MON_ALT = "|".join(_MONTHS)
_MON_MAP = " ".join(
    f"WHEN '{m}' THEN '{i:02d}'" for i, m in enumerate(_MONTHS, 1))

# (fmt, pattern, month-group, day-group, year-group)
_FRAMES = [
    ("mdy_text",
     f"({_MON_ALT}) ([0-9]{{1,2}}), ([0-9]{{4}})", 1, 2, 3),
    ("dmy_text",
     f"([0-9]{{1,2}}) ({_MON_ALT}) ([0-9]{{4}})", 2, 1, 3),
    ("iso",
     "([0-9]{4})-([0-9]{2})-([0-9]{2})", 2, 3, 1),
]


def _mon_num(col: str) -> str:
    return (f"CASE {col} {_MON_MAP} ELSE {col} END")


def extract_dates(
    pages: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """pages(id, text) → (id, mention, day_epoch, fmt): normalized
    absolute-date mentions; calendar-invalid shapes are dropped."""
    out = None
    for fmt, pat, mg, dg, yg in _FRAMES:
        def ex(g: int, _pat: str = pat) -> str:
            return f"regexp_extract_all({text_col}, '{_pat}', {g})"

        z = F.expr(
            "zip_with(zip_with("
            f"{ex(0)}, {ex(mg)}, "
            "(t, m) -> struct(t AS t, m AS m)), "
            f"zip_with({ex(dg)}, {ex(yg)}, "
            "(d, y) -> struct(d AS d, y AS y)), "
            "(a, b) -> struct(a.t AS t, a.m AS m, b.d AS d, b.y AS y))"
        )
        part = (
            pages.select(F.col(id_col), F.explode(z).alias("x"))
            .selectExpr(
                id_col,
                "x.t AS mention",
                "datediff(try_cast(x.y || '-' || "
                + _mon_num("x.m")
                + " || '-' || lpad(x.d, 2, '0') AS DATE),"
                " DATE '1970-01-01') AS day_epoch",
                f"'{fmt}' AS fmt",
            )
            .filter(F.col("day_epoch").isNotNull())
            .withColumn("day_epoch", F.col("day_epoch").cast("long"))
        )
        out = part if out is None else out.unionByName(part)
    return out
