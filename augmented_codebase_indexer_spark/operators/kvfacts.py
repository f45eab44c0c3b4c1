"""Key-value numeric fact mining — infobox-style ``Label: 12,345``
pairs from prose, normalized to exact integers.

The semi-structured middle ground between free text and declared
markup: web pages state numeric attributes in colon frames
("Population: 8,336,817", "Founded: 1998") that neither the OpenIE
patterns nor the structured extractors (JSON-LD/microdata/tables)
see. The frame tier here: a capitalized label of ≤ 4 words, a colon,
and a STRICTLY comma-grouped integer (the grouping regex rejects
'12,34' — malformed grouping is extraction noise, not a number).
Values parse via replace + ``try_cast`` (regex-gated digits first,
TRY_CAST anyway — the repo's string→number discipline), so the output
value column is BIGINT by construction and joins the typed-literal
range checks (`operators/literals.py`) directly.

Engine shape: the quotes/acronyms scan family — one escape-free
regexp pass, zip_with + explode, normalization in codegen; no UDF,
no shuffle.

Reference anchor: the reference parses key-value doc-comment tags
(`core/chunker` docstring metadata); this is the prose-numeric form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# value = properly comma-grouped (>=1 group) OR a plain digit run —
# '1998' is a number, '12,34' is malformed grouping (only '12' parses)
_PAT = ("([A-Z][A-Za-z]*(?: [A-Za-z]+){0,3}): "
        "((?:[0-9]{1,3}(?:,[0-9]{3})+)|[0-9]+)")


def kv_numeric_facts(
    pages: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """pages(id, text) → (id, key, raw, value): colon-framed grouped
    integers; value is the exact BIGINT."""
    z = F.expr(
        f"zip_with(regexp_extract_all({text_col}, '{_PAT}', 1), "
        f"regexp_extract_all({text_col}, '{_PAT}', 2), "
        "(k, v) -> struct(k AS key, v AS raw))"
    )
    return (
        pages.select(F.col(id_col), F.explode(z).alias("m"))
        .selectExpr(
            id_col, "m.key AS key", "m.raw AS raw",
            "try_cast(replace(m.raw, ',', '') AS BIGINT) AS value",
        )
        .filter(F.col("value").isNotNull())
    )
