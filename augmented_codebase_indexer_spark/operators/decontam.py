"""Benchmark decontamination: drop (or flag) training documents that share a
word n-gram with an evaluation/benchmark set.

The standard LLM-training hygiene pass (e.g. GPT-3 appendix C, Gopher §A.5.2
use 8-13-gram overlap): any candidate document containing an n-gram that also
appears in the eval set is contaminated. Reference analog: the reference
indexes a *bounded* corpus so it never needs this; at 10^12 crawled pages it
is mandatory before training.

Scale shape (the part that must survive 100 TB):
* eval-set n-grams are DISTINCT-ed and hashed to fixed-width 60-bit ints
  (``functions/sqlhash.h60_expr`` — verified bit-equal Spark vs DuckDB), then
  **broadcast**: benchmark suites are MBs, never sharded.
* the candidate side explodes its n-gram hashes NARROWLY (no shuffle — the
  explode feeds a broadcast hash join in the same stage), so corpus text
  never moves through an exchange.
* the only shuffle is the hit-count aggregation, and it carries ONLY
  (doc_id, gram_hash) rows that actually matched — on a clean corpus that is
  ~zero rows regardless of corpus size.

No UDFs anywhere; the oracle replays the identical hash pipeline in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.sqlhash import h60_expr, word_shingles_expr
from .guards import DEFAULT_BROADCAST_MAX_ROWS, guarded_broadcast


def _gram_hashes(text_col: str, n: int) -> str:
    """Spark SQL expression: array of 60-bit hashes of the word n-grams of
    ``text_col`` (docs shorter than n tokens hash as one whole-text gram)."""
    grams = word_shingles_expr(text_col, "spark", n=n)
    return f"transform({grams}, g -> {h60_expr('g', 'spark')})"


def eval_ngram_hashes(eval_docs: DataFrame, n: int = 13,
                      text_col: str = "text") -> DataFrame:
    """Distinct 60-bit n-gram hashes of the eval set — the broadcast side."""
    return (
        eval_docs
        .select(F.explode(F.expr(_gram_hashes(text_col, n))).alias("gram_h"))
        .distinct()
    )


def decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 13,
                  id_col: str = "doc_id", text_col: str = "text",
                  broadcast_max_rows: int | None = DEFAULT_BROADCAST_MAX_ROWS,
                  ) -> DataFrame:
    """Per-candidate contamination verdict: (doc_id, n_hits, kept).

    ``n_hits`` = number of DISTINCT eval n-grams the document shares;
    ``kept`` = no overlap. Callers filter ``kept`` to decontaminate, or keep
    the flag for lineage. Default n=13 is the published web-scale setting;
    tests/entries use smaller n because the synthetic corpus has a tiny
    vocabulary (a 13-gram collision there is as rare as a 50-gram on the
    open web).

    ``hits`` is bounded by CONTAMINATED docs — ~zero on a clean corpus but
    unbounded on a contaminated crawl (the very case this pass exists
    for), so its re-join is broadcast only under a counted guard."""
    grams = eval_ngram_hashes(eval_docs, n=n, text_col=text_col)
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(_gram_hashes(text_col, n))).alias("gram_h"),
    )
    hits = (
        doc_grams.join(F.broadcast(grams), "gram_h")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram_h").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(guarded_broadcast(hits, broadcast_max_rows), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce("n_hits", F.lit(0)).eqNullSafe(0).alias("kept"),
        )
    )


def contaminated_ids(docs: DataFrame, eval_docs: DataFrame, n: int = 13,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Distinct ids of docs sharing an n-gram with the eval set — small by
    construction (only rows that HIT the broadcast eval grams survive the
    join), so callers can broadcast it."""
    grams = eval_ngram_hashes(eval_docs, n=n, text_col=text_col)
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.expr(_gram_hashes(text_col, n))).alias("gram_h"),
        )
        .join(F.broadcast(grams), "gram_h")
        .select(id_col)
        .distinct()
    )


def decontaminate_filter(docs: DataFrame, eval_docs: DataFrame, n: int = 13,
                         id_col: str = "doc_id", text_col: str = "text",
                         broadcast_max_rows: int | None = DEFAULT_BROADCAST_MAX_ROWS,
                         ) -> DataFrame:
    """Anti-join form for composed pipelines: returns ``docs`` minus the
    contaminated rows, keeping all input columns. The contaminated-id set
    is small ON A CLEAN CORPUS, so the final anti-join broadcasts under a
    counted guard and degrades to a shuffled anti-join (slim ids, still
    cheap) when a contaminated crawl blows the set up — corpus text never
    shuffles either way."""
    contam = contaminated_ids(docs, eval_docs, n=n, id_col=id_col, text_col=text_col)
    return docs.join(guarded_broadcast(contam, broadcast_max_rows), id_col, "left_anti")


def contamination_report(docs: DataFrame, eval_docs: DataFrame, n: int = 13,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """The reporting side of decontamination: per EVAL document, how
    widely did it leak into the training corpus — (eval_id,
    n_contaminated_docs, n_leaked_grams) for every eval doc (zeros for
    clean ones). This is what an eval-integrity review reads: a benchmark
    item quoted by ten thousand pages is memorized-by-construction and
    should be retired, one quoted by a single mirror just needs that page
    dropped.

    Shape: eval grams keyed BY EVAL DOC broadcast (the eval set is MBs);
    the corpus explode is narrow into the broadcast join; the one
    aggregation carries only matching (eval_id, doc_id, gram_h) rows —
    ~zero on a clean corpus."""
    eg = (
        eval_docs.select(
            F.col(id_col).alias("eval_id"),
            F.explode(F.expr(_gram_hashes(text_col, n))).alias("gram_h"),
        ).distinct()
    )
    dg = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(_gram_hashes(text_col, n))).alias("gram_h"),
    )
    hits = (
        dg.join(F.broadcast(eg), "gram_h")
        .groupBy("eval_id")
        .agg(
            F.count_distinct("doc_id").alias("n_contaminated_docs"),
            F.count_distinct("gram_h").alias("n_leaked_grams"),
        )
    )
    return (
        eval_docs.select(F.col(id_col).alias("eval_id"))
        .join(guarded_broadcast(hits), "eval_id", "left")
        .select(
            "eval_id",
            F.coalesce("n_contaminated_docs", F.lit(0)).cast("long")
            .alias("n_contaminated_docs"),
            F.coalesce("n_leaked_grams", F.lit(0)).cast("long")
            .alias("n_leaked_grams"),
        )
    )


def contamination_report_oracle_sql(n: int, eval_pred: str, cand_pred: str,
                                    table: str = "documents") -> str:
    """DuckDB mirror of ``contamination_report``."""
    grams = word_shingles_expr("text", "duckdb", n=n)
    h = h60_expr("g", "duckdb")
    return f"""
    WITH eg AS (
      SELECT DISTINCT doc_id AS eval_id, {h} AS gram_h
      FROM (SELECT doc_id, unnest({grams}) AS g FROM {table} WHERE {eval_pred})
    ),
    dg AS (
      SELECT doc_id, {h} AS gram_h
      FROM (SELECT doc_id, unnest({grams}) AS g FROM {table} WHERE {cand_pred})
    ),
    hits AS (
      SELECT eval_id, count(DISTINCT doc_id) AS n_docs,
             count(DISTINCT gram_h) AS n_grams
      FROM dg JOIN eg USING (gram_h) GROUP BY eval_id
    )
    SELECT e.doc_id AS eval_id,
           CAST(coalesce(h.n_docs, 0) AS BIGINT) AS n_contaminated_docs,
           CAST(coalesce(h.n_grams, 0) AS BIGINT) AS n_leaked_grams
    FROM (SELECT doc_id FROM {table} WHERE {eval_pred}) e
    LEFT JOIN hits h ON h.eval_id = e.doc_id
    """


def decontaminate_spans(docs: DataFrame, eval_docs: DataFrame, n: int = 13,
                        id_col: str = "doc_id", text_col: str = "text",
                        broadcast_max_rows: int | None = DEFAULT_BROADCAST_MAX_ROWS,
                        ) -> DataFrame:
    """Span-level decontamination: EXCISE the contaminated n-gram windows
    instead of dropping whole documents — the right call when a long page
    quotes a few benchmark lines but the rest is good training text
    (doc-level dropping would throw away the whole page; keeping it
    verbatim leaks the benchmark). A token is removed iff some eval-matching
    n-gram window covers it.

    Shape: per-position window hashes are a narrow transform; only HIT
    positions (doc_id, start) survive the broadcast join, so the per-doc
    start lists are tiny on a clean corpus and broadcast back under the
    counted guard (a heavily contaminated crawl degrades to a shuffled
    join of the slim start lists instead of OOMing the driver). Docs shorter than n tokens
    have no n-gram window and pass through unchanged (the doc-level
    ``decontaminate`` flags those via its whole-text shingle instead).

    Returns (doc_id, clean_text, n_tokens_removed, n_hit_spans)."""
    toks = f"split({text_col}, ' ')"
    win = f"concat_ws(' ', slice({toks}, i, {n}))"
    # NB: Spark sequence(1, 0) DESCENDS ([1, 0]) instead of returning an
    # empty array — docs shorter than n need the explicit CASE guard
    pos_hash = (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> struct(i AS i, {h60_expr(win, 'spark')} AS gram_h)) "
        f"ELSE array() END"
    )
    grams = eval_ngram_hashes(eval_docs, n=n, text_col=text_col)
    starts = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.expr(pos_hash)).alias("ph"),
        )
        .select("doc_id", F.col("ph.i").alias("i"), F.col("ph.gram_h").alias("gram_h"))
        .join(F.broadcast(grams), "gram_h")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("i")).alias("starts"))
    )
    kept = (
        "transform(filter(transform(split(text, ' '), "
        "(t, j0) -> struct(t AS t, j0 + 1 AS j)), "
        f"s -> NOT exists(__starts, st -> st <= s.j AND s.j <= st + {n - 1})), "
        "x -> x.t)"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .join(guarded_broadcast(starts, broadcast_max_rows), "doc_id", "left")
        .withColumn("__starts", F.coalesce("starts", F.array().cast("array<int>")))
        .withColumn("__kept", F.expr(kept))
        .select(
            "doc_id",
            F.array_join("__kept", " ").alias("clean_text"),
            (F.size(F.expr("split(text, ' ')")) - F.size("__kept"))
            .cast("long").alias("n_tokens_removed"),
            F.size("__starts").cast("long").alias("n_hit_spans"),
        )
    )


def decontaminate_spans_oracle_sql(n: int, eval_pred: str, cand_pred: str,
                                   table: str = "documents") -> str:
    """DuckDB mirror of ``decontaminate_spans``."""
    h = h60_expr("array_to_string(toks[i : i + " + str(n - 1) + "], ' ')", "duckdb")
    eval_grams_src = word_shingles_expr("text", "duckdb", n=n)
    eh = h60_expr("g", "duckdb")
    return f"""
    WITH eval_grams AS (
      SELECT DISTINCT {eh} AS gram_h
      FROM (SELECT unnest({eval_grams_src}) AS g FROM {table} WHERE {eval_pred})
    ),
    base AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS nt
      FROM {table} WHERE {cand_pred}
    ),
    posh AS (
      SELECT doc_id, CAST(i AS INT) AS i, {h} AS gram_h
      FROM base, unnest(range(1, greatest(nt - {n - 1}, 0) + 1)) AS r(i)
    ),
    st AS (
      SELECT doc_id, list_sort(list(DISTINCT i)) AS starts
      FROM posh JOIN eval_grams USING (gram_h) GROUP BY doc_id
    )
    SELECT b.doc_id,
           -- coalesce: DuckDB array_to_string([]) is NULL, Spark
           -- array_join([]) is '' — fully-excised docs must agree
           coalesce(array_to_string(
             [b.toks[CAST(j AS INT)] FOR j IN range(1, b.nt + 1)
              IF len(list_filter(coalesce(s.starts, []),
                                 st -> st <= j AND j <= st + {n - 1})) = 0],
             ' '), '') AS clean_text,
           CAST(b.nt - len(
             [b.toks[CAST(j AS INT)] FOR j IN range(1, b.nt + 1)
              IF len(list_filter(coalesce(s.starts, []),
                                 st -> st <= j AND j <= st + {n - 1})) = 0]
           ) AS BIGINT) AS n_tokens_removed,
           CAST(coalesce(len(s.starts), 0) AS BIGINT) AS n_hit_spans
    FROM base b LEFT JOIN st s USING (doc_id)
    """


def decontaminate_oracle_sql(n: int, eval_pred: str, cand_pred: str,
                             table: str = "documents") -> str:
    """DuckDB mirror: same shingles, same 60-bit hash, same join/agg.
    ``eval_pred`` / ``cand_pred`` are SQL predicates splitting ``table``
    into the benchmark set and the candidate corpus."""
    grams = word_shingles_expr("text", "duckdb", n=n)
    h = h60_expr("g", "duckdb")
    return f"""
    WITH eval_grams AS (
      SELECT DISTINCT {h} AS gram_h
      FROM (SELECT unnest({grams}) AS g FROM {table} WHERE {eval_pred})
    ),
    doc_grams AS (
      SELECT doc_id, {h} AS gram_h
      FROM (SELECT doc_id, unnest({grams}) AS g FROM {table} WHERE {cand_pred})
    ),
    hits AS (
      SELECT doc_id, count(DISTINCT d.gram_h) AS n_hits
      FROM doc_grams d JOIN eval_grams USING (gram_h)
      GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           coalesce(h.n_hits, 0) = 0 AS kept
    FROM (SELECT doc_id FROM {table} WHERE {cand_pred}) c
    LEFT JOIN hits h USING (doc_id)
    """
