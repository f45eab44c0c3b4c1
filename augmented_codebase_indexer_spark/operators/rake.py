"""RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley 2010,
"Automatic keyword extraction from individual documents", in Text
Mining: Applications and Theory) — the document-local complement of
the corpus-level TF-IDF keywords (`operators/keywords.py`): candidate
phrases are the maximal token runs between stopwords/punctuation, and
each phrase scores by the degree-to-frequency ratio of its member
words (words that appear in LONG phrases score high; words that appear
everywhere alone score low).  No training, no corpus statistics —
exactly what per-document KG subject hints and section titles need.

Definitions (per document, as in the paper): for each word w occurring
in candidate phrases, ``freq(w)`` = its occurrence count and
``deg(w)`` = Σ over its occurrences of the containing phrase's length;
word score = deg/freq; phrase score = Σ of member-occurrence word
scores.  Repeated phrases collapse to one row with ``n_occurrences``
(their scores are identical by construction — word stats are
doc-level).

Exactness: every count is BIGINT; word score is quantized ONCE as
``deg·1e6 DIV freq`` and phrase scores are sums of those integers —
no floats anywhere.  Phrase text is assembled in token-position order
on both engines (array_sort-then-join / string_agg ORDER BY).

Scale shape at 10^10 docs: everything is doc-local — one tokenize
projection, doc-partitioned windows for run ids and phrase lengths
(tokens-per-doc state), two (doc, ·)-keyed aggregations; the ONLY
exchange key is doc_id, so the whole operator rides one partitioning.

Reference anchor: the reference generates template summaries per
symbol from its own file only (`src/aci/core/summary_generator.py`) —
RAKE is the statistical form of that document-local salience.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000

DEFAULT_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "in", "is", "it", "of", "on", "or", "that", "the", "this", "to",
    "was", "were", "with",
)


def rake_keyphrases(
    docs: DataFrame,
    stopwords: tuple = DEFAULT_STOPWORDS,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, phrase, n_words, n_occurrences, score_micro): every
    candidate phrase of every document with its RAKE score."""
    if not stopwords:
        raise ValueError("rake_keyphrases: stopwords must be non-empty")
    sw = ", ".join(f"'{w}'" for w in stopwords)
    # two-level explode: punctuation first (segments), whitespace second
    # (tokens) — candidate runs must break at punctuation AND at
    # stopwords (the paper's rule; a flat punctuation-stripping split
    # silently fuses "widgets, blue" into one phrase)
    toks = docs.selectExpr(
        f"{doc_col} AS doc_id",
        f"posexplode(split(lower({text_col}), '[^a-z0-9 ]+'))"
        " AS (seg, segment)",
    ).selectExpr(
        "doc_id", "CAST(seg AS BIGINT) AS seg",
        "posexplode(split(segment, '[ ]+')) AS (pos, tok)",
    ).filter(F.col("tok") != "").selectExpr(
        "doc_id", "seg", "CAST(pos AS BIGINT) AS pos", "tok",
        f"tok IN ({sw}) AS is_stop",
    )
    runs = toks.selectExpr(
        "doc_id", "seg", "pos", "tok", "is_stop",
        "sum(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER ("
        "PARTITION BY doc_id, seg ORDER BY pos "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS stoprun",
    ).filter(~F.col("is_stop"))
    members = runs.selectExpr(
        "doc_id", "seg", "stoprun", "pos", "tok",
        "count(*) OVER (PARTITION BY doc_id, seg, stoprun)"
        " AS phrase_len",
    )
    words = members.groupBy("doc_id", "tok").agg(
        F.count("*").cast("long").alias("freq"),
        F.sum("phrase_len").alias("deg"),
    ).selectExpr(
        "doc_id", "tok", f"deg * {MICRO} DIV freq AS w_score"
    )
    phrases = (
        members.join(words, ["doc_id", "tok"])
        .groupBy("doc_id", "seg", "stoprun")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").cast("long").alias("n_words"),
            F.sum("w_score").alias("score_micro"),
        )
    )
    return phrases.groupBy("doc_id", "phrase", "n_words", "score_micro").agg(
        F.count("*").cast("long").alias("n_occurrences")
    ).select("doc_id", "phrase", "n_words", "n_occurrences", "score_micro")


def rake_keyphrases_oracle_sql(
    docs_sql: str, stopwords: tuple = DEFAULT_STOPWORDS
) -> str:
    """DuckDB mirror: same tokenization regex, same run-id window, same
    quantize-once word scores, position-ordered string_agg."""
    sw = ", ".join(f"'{w}'" for w in stopwords)
    return f"""
    WITH d AS (
      SELECT doc_id,
             regexp_split_to_array(lower(text), '[^a-z0-9 ]+') AS _segs
      FROM ({docs_sql})),
    segs AS (
      SELECT doc_id,
             CAST(unnest(range(0, len(_segs))) AS BIGINT) AS seg,
             unnest(_segs) AS segment
      FROM d),
    t0 AS (
      SELECT doc_id, seg,
             regexp_split_to_array(segment, '[ ]+') AS _ts
      FROM segs),
    toks AS (
      SELECT doc_id, seg,
             CAST(unnest(range(0, len(_ts))) AS BIGINT) AS pos,
             unnest(_ts) AS tok
      FROM t0),
    flagged AS (
      SELECT doc_id, seg, pos, tok, tok IN ({sw}) AS is_stop
      FROM toks WHERE tok <> ''),
    runs AS (
      SELECT doc_id, seg, pos, tok,
             sum(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
               PARTITION BY doc_id, seg ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS stoprun,
             is_stop
      FROM flagged),
    members AS MATERIALIZED (
      SELECT doc_id, seg, stoprun, pos, tok,
             CAST(count(*) OVER (PARTITION BY doc_id, seg, stoprun)
                  AS BIGINT) AS phrase_len
      FROM runs WHERE NOT is_stop),
    words AS (
      SELECT doc_id, tok,
             sum(phrase_len) * {MICRO} // CAST(count(*) AS BIGINT)
               AS w_score
      FROM members GROUP BY doc_id, tok),
    phrases AS (
      SELECT m.doc_id, m.seg, m.stoprun,
             string_agg(m.tok, ' ' ORDER BY m.pos) AS phrase,
             CAST(count(*) AS BIGINT) AS n_words,
             sum(w.w_score) AS score_micro
      FROM members m JOIN words w
        ON w.doc_id = m.doc_id AND w.tok = m.tok
      GROUP BY m.doc_id, m.seg, m.stoprun)
    SELECT doc_id, phrase, n_words,
           CAST(count(*) AS BIGINT) AS n_occurrences, score_micro
    FROM phrases GROUP BY doc_id, phrase, n_words, score_micro
    """
