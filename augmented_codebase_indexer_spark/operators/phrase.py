"""Phrase search — exact consecutive-token matching, zero-shuffle.

The reference's search accepts quoted exact patterns (pattern search
over file content, `cli/repl/search_ops.py` grep tier); the analytics
form is "which documents contain this exact PHRASE, how many times,
and where first" — the quoted-query primitive of every web search
surface, and the span locator the decontamination operators use for
n-gram overlaps (here generalized to arbitrary user phrases).

Spark-first shape: phrase matching is a WITHIN-ROW property, so it
needs no inverted index and no shuffle at all — tokenize to an array,
then test every window position with ``slice(toks, p, k) == terms``
inside one whole-stage-codegen projection (``filter`` over a
``sequence`` of candidate positions). An indexed engine answers one
query faster; a 100 TB BATCH scorer (decontamination, labeling, corpus
QA) wants exactly this: embarrassingly parallel, pipelined into the
scan, no index to build or keep fresh. Matches count OVERLAPPING
occurrences (position semantics, not str.count semantics) — both
engines agree by construction.

Tokenization is the repo's shared non-alphanumeric split (same regex
as ``anchors``/``corpusstats``), positions are 1-based token indexes
AFTER empty-token removal, and all outputs are BIGINT — the DuckDB
mirror (list_filter + lateral generate_series + list slice) is exact.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOK_SPLIT = "[^a-z0-9]+"


def _phrase_terms(phrase: str) -> list[str]:
    terms = [t for t in re.split(_TOK_SPLIT, phrase.lower()) if t]
    if not terms:
        raise ValueError(f"phrase {phrase!r} contains no indexable tokens")
    return terms


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), _TOK_SPLIT), lambda x: x != F.lit("")
    )


def _match_positions(phrase: str, text_col: str) -> Column:
    """array<int> of 1-based start positions of ``phrase`` in the
    tokenized text — the shared core of the frame- and predicate-form.

    r7: the position test compares terms in place with ``element_at``
    instead of allocating a k-slice array per candidate position and
    comparing arrays, and the token array is bound ONCE via the
    single-element ``transform`` idiom so the split/filter is not
    re-evaluated per reference inside the lambda. Identical positions:
    ``slice(toks, p, k) == terms`` ⟺ ``∀i element_at(toks, p+i) ==
    terms[i]`` for the in-bounds p the sequence generates."""
    terms = _phrase_terms(phrase)
    k = len(terms)
    toks = _tokens(text_col)

    def _positions(t: Column) -> Column:
        def _at(p: Column) -> Column:
            cond = None
            for i, term in enumerate(terms):
                c = F.element_at(t, p + F.lit(i)) == F.lit(term)
                cond = c if cond is None else cond & c
            return cond

        # candidate start positions 1..n-k+1; sequence() descends when
        # stop < start, so short docs take the empty-array branch
        return F.when(
            F.size(t) >= k,
            F.filter(F.sequence(F.lit(1), F.size(t) - F.lit(k - 1)), _at),
        ).otherwise(F.array().cast("array<integer>"))

    return F.transform(F.array(toks), _positions).getItem(0)


def phrase_predicate(phrase: str, text_col: str = "text") -> Column:
    """Boolean Column: the document contains ``phrase`` as consecutive
    tokens. Pure codegen expression — composes into any scan filter
    (the quoted-term tier of the search grammar uses it)."""
    return F.size(_match_positions(phrase, text_col)) > 0


def phrase_match(
    docs: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """docs → (doc_id, n_matches, first_pos) for documents containing
    ``phrase`` as consecutive tokens. ``first_pos`` is the 1-based
    token index of the first occurrence; occurrences may overlap."""
    pos = _match_positions(phrase, text_col)
    return (
        docs.select(F.col(id_col).alias("doc_id"), pos.alias("pos"))
        .filter(F.size("pos") > 0)
        .select(
            "doc_id",
            F.size("pos").cast("long").alias("n_matches"),
            F.element_at("pos", 1).cast("long").alias("first_pos"),
        )
    )


def phrase_match_sql(
    phrase: str, docs_sql: str = "SELECT doc_id, text FROM documents"
) -> str:
    """DuckDB mirror: lateral generate_series over candidate positions,
    1-based inclusive list slice compared to the literal term list."""
    terms = _phrase_terms(phrase)
    k = len(terms)
    lit = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    return f"""
    WITH d AS ({docs_sql}),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{_TOK_SPLIT}'),
                         x -> x <> '') AS l
      FROM d),
    hits AS (
      SELECT t.doc_id, g.p
      FROM toks t,
           LATERAL (SELECT unnest(generate_series(1, len(t.l) - {k - 1})) AS p) g
      WHERE len(t.l) >= {k} AND t.l[g.p : g.p + {k - 1}] = {lit})
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(min(p) AS BIGINT) AS first_pos
    FROM hits GROUP BY doc_id
    """
