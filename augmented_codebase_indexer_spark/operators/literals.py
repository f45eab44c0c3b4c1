"""Object-literal typing — the literal-normalization step of KG
construction (RDF gives literals datatypes; web extraction hands you
strings): classify each triple's object as bool / integer / decimal /
ISO date / entity and surface a machine-usable typed value, so range
queries ("founded before 1990", "population > 10^6") run on integers
instead of strings.

Typing is deterministic and REGEX-GATED BEFORE ANY CAST — the engines'
bare string→number casts disagree on edge forms (DuckDB TRY_CAST
('12.5' AS BIGINT) rounds to 13; Spark's returns NULL), so the regex
decides the type and the cast only runs on strings both engines parse
identically:

  bool     — lower(obj) ∈ {true, false}            → bool_val
  integer  — ^-?[0-9]{1,18}$                       → num_micro = n·1e6
  decimal  — ^-?[0-9]{1,12}\\.[0-9]+$              → num_micro =
             sign·(ipart·1e6 + first-6-frac-digits zero-padded) —
             pure STRING arithmetic, no float anywhere; digits past
             the 6th truncate (documented micro precision)
  date     — ^\\d{4}-\\d{2}-\\d{2}$ AND a real calendar date
             (try_cast validates month/day identically)  → day_epoch
  entity   — everything else (the id case)

Length caps keep the BIGINT arithmetic overflow-free (1e18·1e6 would
overflow; 18/12-digit caps fall back to 'entity' — observable, and far
beyond any real-world literal).

Scale: one whole-stage-codegen projection — no shuffle, no Python, no
UDF. Runs as a narrow stage fused into the extraction pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_RE = "^-?[0-9]{1,18}$"
# [.] instead of \. — Spark SQL single-quoted literals PROCESS
# backslashes (so '\.' reaches the regex engine as '.'), DuckDB's don't;
# a character class is escape-free and identical in both
_DEC_RE = "^-?[0-9]{1,12}[.][0-9]+$"
_DATE_RE = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"


def _typing_exprs(dialect: str) -> dict[str, str]:
    """The five typed output columns as SQL shared verbatim-in-structure
    between engines (dialect only changes function spellings)."""
    if dialect == "spark":
        rx = lambda r: f"obj RLIKE '{r}'"  # noqa: E731
        date_ok = f"({rx(_DATE_RE)}) AND try_cast(obj AS DATE) IS NOT NULL"
        day = "datediff(try_cast(obj AS DATE), DATE '1970-01-01')"
        idx = "instr(obj, '.')"
    else:
        rx = lambda r: f"regexp_matches(obj, '{r}')"  # noqa: E731
        date_ok = f"({rx(_DATE_RE)}) AND TRY_CAST(obj AS DATE) IS NOT NULL"
        day = "(TRY_CAST(obj AS DATE) - DATE '1970-01-01')"
        idx = "strpos(obj, '.')"
    is_bool = "lower(obj) IN ('true', 'false')"
    is_int = rx(_INT_RE)
    is_dec = rx(_DEC_RE)
    sign = f"CASE WHEN substring(obj, 1, 1) = '-' THEN -1 ELSE 1 END"
    unsigned = ("CASE WHEN substring(obj, 1, 1) = '-' "
                "THEN substring(obj, 2) ELSE obj END")
    ipart = f"substring({unsigned}, 1, {idx.replace('obj', unsigned)} - 1)"
    frac = f"substring({unsigned}, {idx.replace('obj', unsigned)} + 1)"
    frac6 = f"rpad(substring({frac}, 1, 6), 6, '0')"
    dec_micro = (
        f"({sign}) * (TRY_CAST({ipart} AS BIGINT) * 1000000 "
        f"+ TRY_CAST({frac6} AS BIGINT))"
    )
    obj_type = (
        f"CASE WHEN {is_bool} THEN 'bool' "
        f"WHEN {is_int} THEN 'integer' "
        f"WHEN {is_dec} THEN 'decimal' "
        f"WHEN {date_ok} THEN 'date' "
        "ELSE 'entity' END"
    )
    return {
        "obj_type": obj_type,
        "bool_val": (f"CASE WHEN {is_bool} "
                     "THEN lower(obj) = 'true' END"),
        "num_micro": (
            f"CASE WHEN {is_int} THEN TRY_CAST(obj AS BIGINT) * 1000000 "
            f"WHEN {is_dec} THEN {dec_micro} END"
        ),
        "day_epoch": (
            f"CASE WHEN NOT ({is_bool}) AND NOT ({is_int}) "
            f"AND NOT ({is_dec}) AND {date_ok} "
            f"THEN CAST({day} AS BIGINT) END"
        ),
    }


def type_object_literals(triples: DataFrame) -> DataFrame:
    """→ (subj, pred, obj, obj_type, bool_val, num_micro, day_epoch):
    every triple, its object classified and (where typed) parsed."""
    ex = _typing_exprs("spark")
    return triples.selectExpr(
        "subj", "pred", "obj",
        f"{ex['obj_type']} AS obj_type",
        f"{ex['bool_val']} AS bool_val",
        f"{ex['num_micro']} AS num_micro",
        f"{ex['day_epoch']} AS day_epoch",
    )


def type_object_literals_oracle_sql(triples_sql: str) -> str:
    ex = _typing_exprs("duckdb")
    return f"""
    SELECT subj, pred, obj,
           {ex['obj_type']} AS obj_type,
           {ex['bool_val']} AS bool_val,
           {ex['num_micro']} AS num_micro,
           {ex['day_epoch']} AS day_epoch
    FROM ({triples_sql})
    """
