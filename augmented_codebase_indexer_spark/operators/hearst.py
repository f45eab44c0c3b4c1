"""Hearst-pattern hypernym extraction — ``is_a`` triples from raw text.

The classic lexico-syntactic patterns of Hearst 1992 ("Automatic
Acquisition of Hyponyms from Large Text Corpora", COLING):

* ``NP_h such as NP₁, NP₂ and NP₃``      → (NPᵢ, is_a, NP_h)
* ``NP₁, NP₂ and other NP_h``            → (NPᵢ, is_a, NP_h)
* ``NP_h including NP₁ …``               → (NPᵢ, is_a, NP_h)
* ``NP_h, especially NP₁ …``             → (NPᵢ, is_a, NP_h)

This is the taxonomy-edge complement to the gazetteer/pattern OpenIE
stage (``operators/extraction.py``): the reference's analog is its
pattern-based relationship extraction over parsed code
(`src/aci/core/relationship_extractor.py` walks fixed syntactic
shapes); here the fixed shapes are Hearst's, over web text.

Without an NLP chunker (none in this sandbox, none needed at this
fidelity) an NP is a capitalized token ``[A-Z][a-z]+`` — the standard
chunker-free approximation; the hypernym slot is the single token
touching the trigger phrase. Documented subset: multi-word NPs and
lowercase hypernym phrases are out of scope (callers with a chunker
can swap ``_NP``).

Scale shape: ONE narrow projection — ``regexp_extract_all`` per
pattern fused into a single whole-stage-codegen scan, explode, then
per-match group extraction and list split, all ``pyspark.sql.functions``
(zero Python UDFs, zero shuffles; the output is as parallel as the
input). At 10^12 docs this is embarrassingly parallel CPU work that
pipelines with extraction in the same stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NP = r"[A-Z][a-z]+"
_LIST = rf"{_NP}(?:, {_NP})*(?:,? (?:and|or) {_NP})?"

# (label, pattern, hypernym group, list group)
PATTERNS: tuple[tuple[str, str, int, int], ...] = (
    ("such_as", rf"(\w+) such as ({_LIST})", 1, 2),
    ("and_other", rf"({_LIST}),? and other (\w+)", 2, 1),
    ("including", rf"(\w+),? including ({_LIST})", 1, 2),
    ("especially", rf"(\w+), especially ({_LIST})", 1, 2),
)

# splits a matched NP list into its NPs (Oxford comma included)
_LIST_SPLIT = r",?\s+(?:and|or)\s+|,\s+"


def hearst_hypernyms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, hypo, pred='is_a', hyper, pattern) — one row per
    extracted hyponym occurrence (callers aggregate evidence counts;
    this stage stays 1:1 with the text)."""
    def _tag(label: str):
        # NB: F.transform dispatches on lambda ARITY — a second (default)
        # parameter would be bound to the element index, so the label
        # must be captured by closure, not by default argument
        return lambda m: F.struct(F.lit(label).alias("pattern"),
                                  m.alias("m"))

    matches = F.flatten(
        F.array(
            *[
                F.transform(
                    F.regexp_extract_all(
                        F.col(text_col), F.lit(pat), F.lit(0)
                    ),
                    _tag(label),
                )
                for label, pat, _, _ in PATTERNS
            ]
        )
    )
    pm = docs.select(id_col, F.explode(matches).alias("pm")).select(
        id_col,
        F.col("pm.pattern").alias("pattern"),
        F.col("pm.m").alias("m"),
    )

    def _dispatch(group_idx: int) -> F.Column:
        expr = None
        for label, pat, hg, lg in PATTERNS:
            g = hg if group_idx == 0 else lg
            branch = F.regexp_extract("m", pat, g)
            expr = (
                F.when(F.col("pattern") == label, branch)
                if expr is None
                else expr.when(F.col("pattern") == label, branch)
            )
        return expr

    return pm.select(
        id_col,
        F.explode(F.split(_dispatch(1), _LIST_SPLIT)).alias("hypo"),
        F.lit("is_a").alias("pred"),
        _dispatch(0).alias("hyper"),
        "pattern",
    )
