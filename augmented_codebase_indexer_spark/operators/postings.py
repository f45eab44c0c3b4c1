"""Positional postings + proximity search — the inverted-index query the
scan-based ``operators/phrase.py`` deliberately avoids, here in its
relational form (Manning/Raghavan/Schütze IIR §2.4 positional postings;
proximity = the classic "all terms within a w-token window" operator).

The postings RELATION (term, doc_id, pos) IS the positional index: at
100 TB it is written once, bucketed BY TERM (``sources/catalog.py``
bucket discipline), so a query's per-term posting fetch is a bucket-
pruned scan instead of a corpus scan — the batch-analytics analog of a
posting list seek. Query evaluation is a doc_id-keyed k-way equi-join
of the query terms' postings, pruned AFTER EVERY join step by the
window predicate (greatest − least < w), so intermediate candidate
rows never exceed docs-containing-all-terms-so-far × bounded position
combinations. A per-(doc, term) position cap (``max_positions``,
deterministic: lowest positions win) bounds the combination blowup on
pathological repeat-heavy docs — same observable-cap discipline as the
dedup bucket caps.

Output is exact integers: the MINIMAL covering span per matching doc,
ties broken by earliest start — (doc_id, span_start, span_len,
n_terms). DuckDB oracle replays the same joins; tokenization is the
``keywords.py``/``bm25.py`` contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TOK_SPLIT = "[^a-z0-9]+"


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (term, doc_id, pos): 0-based token positions, empties dropped
    (positions still count empty-producing splits? no — positions index
    the NON-EMPTY token sequence, the standard postings convention)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), _TOK_SPLIT),
            lambda t: t != "",
        ).alias("toks"),
    )
    return toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).select("term", "doc_id", F.col("pos").cast("long").alias("pos"))


def proximity_search(
    docs: DataFrame,
    terms: list[str],
    window: int = 8,
    max_positions: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Docs containing ALL ``terms`` within a ``window``-token span.

    → (doc_id, span_start, span_len, n_terms): the minimal covering
    span (ties → earliest start). ``span_len`` = last − first + 1 ≤
    window. Duplicate query terms collapse; a doc's positions per term
    are capped at the ``max_positions`` lowest (deterministic)."""
    q = sorted({t.lower() for t in terms if t})
    if not q:
        raise ValueError("proximity_search: empty query")
    post = positional_postings(docs, id_col, text_col)
    w_cap = Window.partitionBy("doc_id", "term").orderBy(F.asc("pos"))
    capped = (
        post.filter(F.col("term").isin(*q))
        .withColumn("_rn", F.row_number().over(w_cap))
        .filter(F.col("_rn") <= max_positions)
        .drop("_rn")
    )
    base = capped.filter(F.col("term") == q[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for i, t in enumerate(q[1:], start=1):
        nxt = capped.filter(F.col("term") == t).select(
            "doc_id", F.col("pos").alias(f"p{i}")
        )
        cols = [f"p{j}" for j in range(i + 1)]
        base = base.join(nxt, "doc_id").filter(
            F.greatest(*cols) - F.least(*cols) < window
        )
    cols = [f"p{j}" for j in range(len(q))]
    if len(cols) == 1:  # greatest/least need >= 2 columns
        spans = base.select(
            "doc_id", F.lit(1).alias("span_len"),
            F.col("p0").alias("span_start"),
        )
    else:
        spans = base.select(
            "doc_id",
            (F.greatest(*cols) - F.least(*cols) + 1).alias("span_len"),
            F.least(*cols).alias("span_start"),
        )
    return (
        spans.groupBy("doc_id")
        .agg(F.min(F.struct("span_len", "span_start")).alias("_best"))
        .select(
            "doc_id",
            F.col("_best.span_start").cast("long").alias("span_start"),
            F.col("_best.span_len").cast("long").alias("span_len"),
            F.lit(len(q)).cast("long").alias("n_terms"),
        )
    )


def proximity_oracle_sql(
    terms: list[str],
    window: int = 8,
    max_positions: int = 50,
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB mirror — identical tokenization (list comprehension over the
    filtered token array gives the same 0-based non-empty positions),
    identical caps, joins, window predicate and min-span tie-break."""
    q = sorted({t.lower() for t in terms if t})
    if not q:
        raise ValueError("proximity_oracle_sql: empty query")
    joins, cols = [], ["t0.pos AS p0"]
    for i in range(1, len(q)):
        joins.append(
            f"JOIN capped t{i} ON t{i}.doc_id = t0.doc_id "
            f"AND t{i}.term = '{q[i]}'"
        )
        cols.append(f"t{i}.pos AS p{i}")
    all_p = ", ".join(f"p{j}" for j in range(len(q)))
    term_list = ", ".join(f"'{t}'" for t in q)
    if len(q) == 1:
        span_sel = "1 AS span_len, p0 AS span_start"
        span_where = "TRUE"
    else:
        span_sel = (
            f"greatest({all_p}) - least({all_p}) + 1 AS span_len, "
            f"least({all_p}) AS span_start"
        )
        span_where = f"greatest({all_p}) - least({all_p}) < {window}"
    return f"""
    WITH d AS ({docs_sql}),
    tokarr AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{_TOK_SPLIT}'),
                         t -> t <> '') AS toks
      FROM d),
    post AS (
      -- parallel unnests zip (the robots-oracle precedent): term with
      -- its 0-based position in the non-empty token sequence
      SELECT doc_id, unnest(toks) AS term,
             CAST(unnest(range(0, len(toks))) AS BIGINT) AS pos
      FROM tokarr),
    qpost AS (SELECT * FROM post WHERE term IN ({term_list})),
    capped AS (
      SELECT doc_id, term, pos FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id, term ORDER BY pos) AS rn
        FROM qpost) WHERE rn <= {max_positions}),
    combos AS (
      SELECT t0.doc_id, {", ".join(cols)}
      FROM capped t0 {" ".join(joins)}
      WHERE t0.term = '{q[0]}'),
    spans AS (
      SELECT doc_id, {span_sel}
      FROM combos WHERE {span_where}),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY span_len, span_start) AS rn
      FROM spans)
    SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
           CAST(span_len AS BIGINT) AS span_len,
           CAST({len(q)} AS BIGINT) AS n_terms
    FROM ranked WHERE rn = 1
    """


def snippet_search(
    docs: DataFrame,
    terms: list[str],
    window: int = 8,
    context: int = 3,
    max_positions: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, span_start, span_len, snippet): the proximity hits with
    a USER-FACING extract — the minimal covering span widened by
    ``context`` tokens each side, re-joined from the doc's own token
    sequence (search-result snippets; the read-path the reference's
    search service renders). Slicing clamps at both document edges.

    One extra doc_id-keyed join against the hit set (tiny: only matching
    docs re-tokenize for the slice), everything in codegen."""
    hits = proximity_search(
        docs, terms, window=window, max_positions=max_positions,
        id_col=id_col, text_col=text_col,
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), _TOK_SPLIT),
            lambda t: t != "",
        ).alias("toks"),
    )
    return (
        hits.join(toks, "doc_id")
        .selectExpr(
            "doc_id", "span_start", "span_len",
            f"array_join(slice(toks, "
            f"CAST(greatest(0L, span_start - {context}) + 1 AS INT), "
            f"CAST(span_start + span_len + {context} "
            f"- greatest(0L, span_start - {context}) AS INT)), ' ') "
            "AS snippet",
        )
    )


def snippet_oracle_sql(
    terms: list[str],
    window: int = 8,
    context: int = 3,
    max_positions: int = 50,
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB mirror: the proximity oracle as a CTE + the same clamped
    token slice (list_slice is 1-based inclusive and clamps, matching
    Spark's slice(start, length) with the same endpoints)."""
    prox = proximity_oracle_sql(
        terms, window=window, max_positions=max_positions, docs_sql=docs_sql
    )
    return f"""
    WITH prox AS MATERIALIZED ({prox}),
    dtoks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '{_TOK_SPLIT}'),
                         t -> t <> '') AS toks
      FROM ({docs_sql}))
    SELECT p.doc_id, p.span_start, p.span_len,
           array_to_string(list_slice(d.toks,
             greatest(0, p.span_start - {context}) + 1,
             p.span_start + p.span_len + {context}), ' ') AS snippet
    FROM prox p JOIN dtoks d USING (doc_id)
    """


def first_occurrence_snippets(
    docs: DataFrame,
    terms: list[str],
    context: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, pos, snippet): a context window around the FIRST
    token CONTAINING any query term — the fallback snippet when no
    single span covers every term (single-term matches, OR-semantics
    rankers). Substring matching mirrors the pattern backend's
    `contains` semantics ('cluster' highlights 'clustering').
    Deterministic: min position wins."""
    q = sorted({t.lower() for t in terms if t})
    if not q:
        raise ValueError("first_occurrence_snippets: empty query")
    posts = positional_postings(docs, id_col=id_col, text_col=text_col)
    cond = None
    for t in q:
        c = F.col("term").contains(t)
        cond = c if cond is None else (cond | c)
    first = (
        posts.filter(cond)
        .groupBy("doc_id")
        .agg(F.min("pos").cast("long").alias("pos"))
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), _TOK_SPLIT),
            lambda t: t != "",
        ).alias("toks"),
    )
    return (
        first.join(toks, "doc_id")
        .selectExpr(
            "doc_id", "pos",
            f"array_join(slice(toks, "
            f"CAST(greatest(0L, pos - {context}) + 1 AS INT), "
            f"CAST(pos + 1 + {context} - greatest(0L, pos - {context}) "
            f"AS INT)), ' ') AS snippet",
        )
    )
