"""Acronym–definition mining — ``long form (ACRONYM)`` pairs with
initials verification.

The abbreviation-definition task (Schwartz & Hearst PSB'03): scientific
and web prose introduces acronyms parenthetically after their long
form, so candidate pairs fall out of one regex and a cheap character
check separates real definitions from coincidental parentheses. This
implements the initials-strict tier of the Schwartz–Hearst matcher: a
candidate is up to 5 alphabetic words before ``(CAPS)``; it verifies
iff the initials of its LAST ``|acronym|`` words spell the acronym
(case-folded), and the emitted long form is exactly that suffix — the
minimal verified definition, not the whole candidate window.

The (acronym → long form) pairs are alias edges for the
canonicalization tier (same role as the anchor-text alias miner) and
the expansion table query rewriting wants.

Engine shape: one ``regexp_extract_all`` (escape-free pattern —
parentheses via character classes, no backslash reaches the SQL
literal) + array ops (`split`/`slice`/`transform`) — all codegen, no
UDF, no shuffle; verification is per-extracted-candidate, never
per-page-text.

Reference anchor: the reference mines import-alias pairs per module
(`core/symbols`); this is the prose analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# parens as character classes keep the single-quoted SQL literal free
# of backslashes (Spark processes them, DuckDB doesn't)
_PAT = "([A-Za-z]+(?: [A-Za-z]+){0,4}) [(]([A-Z]{2,5})[)]"


def mine_acronyms(
    pages: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """pages(id, text) → (id, long_form, acronym): verified
    definitions only; long_form is the minimal |acronym|-word suffix."""
    z = F.expr(
        f"zip_with(regexp_extract_all({text_col}, '{_PAT}', 1), "
        f"regexp_extract_all({text_col}, '{_PAT}', 2), "
        "(c, a) -> struct(c AS cand, a AS acr))"
    )
    cands = (
        pages.select(F.col(id_col), F.explode(z).alias("m"))
        .select(id_col, "m.cand", "m.acr")
        .withColumn("words", F.split("cand", " "))
        .filter(F.size("words") >= F.length("acr"))
    )
    tail = F.expr(
        "slice(words, size(words) - length(acr) + 1, length(acr))")
    initials = F.expr(
        "array_join(transform(slice(words, size(words) - length(acr) + 1,"
        " length(acr)), w -> upper(substr(w, 1, 1))), '')")
    return (
        cands.withColumn("_tail", tail)
        .withColumn("_init", initials)
        .filter(F.col("_init") == F.col("acr"))
        .select(
            id_col,
            F.array_join("_tail", " ").alias("long_form"),
            F.col("acr").alias("acronym"),
        )
    )
