"""Negation-guarded assertion mining — negated copula/membership claims
as a SUPPRESSION relation for the extraction tiers.

Pattern extractors are polarity-blind: "a tomato is not a vegetable"
matches the same copula shape that feeds is_a mining, and shipping it
as a positive triple is the classic extraction false positive
(NegEx, Chapman et al. J.Biomed.Inf.'01 — the rule-based negation
scoping that clinical IE has used for two decades; the web form here
keeps the TIGHT scope only: an explicit negator directly inside the
copula frame, no long-range scope guessing). Three frames:

- ``is_not_a``:   ``X is not a(n) Y`` / ``X is no Y``
- ``never``:      ``X was never a(n) Y``
- ``denial``:     ``X denied being a(n) Y``

Output (doc, subj, pred='is_a', obj, frame) is a NEGATIVE evidence
relation: the multi-source fusion tier counts it as a refuting vote
and the publish gate anti-joins suppressions at fact grain —
"extract the denial, don't assert it."

Engine shape: the quotes/acronyms scan family — escape-free regexes,
zip_with + explode, no UDF, no shuffle.

Reference anchor: the reference drops commented-out code before
symbol extraction (`core/chunker`) — the code-world form of "matched
the shape, asserted the opposite".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_E = "[A-Za-z][A-Za-z0-9]*"
FRAMES = [
    ("is_not_a", f"({_E}) is not an? ({_E})"),
    ("is_no", f"({_E}) is no ({_E})"),
    ("never", f"({_E}) was never an? ({_E})"),
    ("denial", f"({_E}) denied being an? ({_E})"),
]


def negated_assertions(
    pages: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """pages(id, text) → (id, subj, pred, obj, frame): negated
    membership claims, one row per match."""
    out = None
    for frame, pat in FRAMES:
        z = F.expr(
            f"zip_with(regexp_extract_all({text_col}, '{pat}', 1), "
            f"regexp_extract_all({text_col}, '{pat}', 2), "
            "(s, o) -> struct(s AS subj, o AS obj))"
        )
        part = (
            pages.select(F.col(id_col), F.explode(z).alias("m"))
            .select(
                id_col, "m.subj",
                F.lit("is_a").alias("pred"), "m.obj",
                F.lit(frame).alias("frame"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out
