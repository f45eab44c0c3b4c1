"""BM25 ranked retrieval — the standard lexical relevance function
(Robertson & Spärck Jones; the Okapi BM25 form with k1 = 1.2, b = 0.75),
built as an EXACT integer dataflow so the DuckDB oracle reproduces every
score bit-for-bit.

The reference ranks lexical candidates before blending scores
(`src/aci/services/search_service.py:188-204`); tf-idf keywords
(``operators/keywords.py``) are the per-document descriptor form. BM25
is the per-QUERY ranking form every web search stack starts from, and
at corpus scale it is three narrow aggregations:

    dl  — one (doc) groupBy over the exploded tokens (map-side combined)
    tf  — one (doc, term) groupBy over ONLY the query's terms
          (filter BEFORE the shuffle: the explode never leaves its
          partition carrying non-query terms)
    df  — one (term) groupBy over the query terms' distinct docs

The corpus constants N (docs) and S (total tokens) ride a 1-row
crossJoin; the final per-doc sum + top-k is a TakeOrderedAndProject.

Exactness (the repo's oracle discipline):

* ``idf_micro = ln_micro((2N − 2·df + 1) / (2·df + 1))`` — the
  Robertson idf ln((N − df + 0.5)/(df + 0.5)) with numerator and
  denominator doubled into integers, evaluated by the LIBM-FREE
  fixed-point log (``functions/intlog.py``). Negative for df > N/2,
  exactly as the classic formula.
* The tf/length normalization is staged integer division with ONE
  quantize-once, ``adl_micro = (S·1e6) DIV N`` (average doc length in
  micro-tokens):

      inner       = 3 + (9_000_000·dl) DIV adl_micro
      ratio_micro = (22_000_000·tf) DIV (10·tf + inner)
      term_micro  = (idf_micro · ratio_micro) DIV 1_000_000

  which is 1e6 · tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl)) for
  k1 = 1.2 = 12/10 and b = 0.75, up to the two deterministic
  truncations both engines perform identically. Overflow bounds:
  9e6·dl and 2.2e7·tf stay inside BIGINT for dl, tf < 10^11 —
  any real document qualifies; idf_micro·ratio_micro ≤ ~7e13.

Ranking: (score_micro desc, doc_id asc) — fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.intlog import duckdb_ln_micro_sql, ln_micro_py, with_ln_micro

_TOK_SPLIT = "[^a-z0-9]+"  # the keywords.py tokenizer — shared contract


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_hits, score_micro, rank): top-k docs by exact-integer
    BM25 over ``query_terms`` (lowercased; duplicates collapse). Docs
    matching no term are absent."""
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms:
        raise ValueError("bm25_search: empty query")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), _TOK_SPLIT)).alias("term"),
    ).filter(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    # N over the INPUT frame (docs with no tokens still count — standard
    # BM25 corpus size), S over the token stream; one slim 1-row frame
    consts = (
        docs.select(F.col(id_col).alias("doc_id"))
        .agg(F.count("*").cast("long").alias("N"))
        .crossJoin(
            F.broadcast(dl.agg(F.sum("dl").cast("long").alias("S")))
        )
        .withColumn("adl_micro", F.expr("(S * 1000000) DIV N"))
    )
    qtoks = toks.filter(F.col("term").isin(*terms))
    tf = qtoks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    df_t = (
        qtoks.select("doc_id", "term").distinct()
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    idf = with_ln_micro(
        df_t.crossJoin(F.broadcast(consts.select("N"))),
        "2 * N - 2 * df + 1", "2 * df + 1", "idf_micro",
    ).select("term", "idf_micro")
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts.select("adl_micro")))
        .selectExpr(
            "doc_id",
            "(idf_micro * ((22000000 * tf) DIV "
            " (10 * tf + 3 + (9000000 * dl) DIV adl_micro))) DIV 1000000"
            " AS term_micro",
        )
    )
    ranked = (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.sum("term_micro").cast("long").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(k)
    )
    # the window runs AFTER the top-k limit, so its single partition
    # holds ≤ k rows — bounded by the parameter, never by corpus size
    w_rank = F.row_number().over(
        Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    )
    return ranked.withColumn("rank", w_rank.cast("long"))


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB mirror — identical tokenization, identical staged integer
    arithmetic, identical (score desc, doc_id) top-k."""
    terms = sorted({t.lower() for t in query_terms if t})
    term_list = ", ".join(f"'{t}'" for t in terms)
    idf_sql = duckdb_ln_micro_sql(
        "SELECT term, df, n.N FROM dft CROSS JOIN n",
        "2 * N - 2 * df + 1", "2 * df + 1", "idf_micro", keep_cols="term",
    )
    return f"""
    WITH d AS ({docs_sql}),
    tokraw AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '{_TOK_SPLIT}')) AS term
      FROM d),
    tok AS (SELECT * FROM tokraw WHERE term <> ''),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM tok GROUP BY doc_id),
    n AS (SELECT CAST(count(*) AS BIGINT) AS N FROM d),
    s AS (SELECT CAST(sum(dl) AS BIGINT) AS S FROM dl),
    adl AS (SELECT (S * 1000000) // N AS adl_micro FROM n CROSS JOIN s),
    qt AS (SELECT * FROM tok WHERE term IN ({term_list})),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM qt GROUP BY doc_id, term),
    dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM qt GROUP BY term),
    idf AS ({idf_sql}),
    scored AS (
      SELECT tf.doc_id,
             (idf.idf_micro * ((22000000 * tf.tf) //
              (10 * tf.tf + 3 + (9000000 * dl.dl) // adl.adl_micro)))
              // 1000000 AS term_micro
      FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN adl),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
             CAST(sum(term_micro) AS BIGINT) AS score_micro
      FROM scored GROUP BY doc_id),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
        ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) AS rank
      FROM agg)
    SELECT doc_id, n_hits, score_micro, rank
    FROM ranked WHERE rank <= {k}
    """


def bm25_py(
    docs: dict[int, str], query_terms: list[str], k: int = 10
) -> list[tuple[int, int, int, int]]:
    """Pure-python mirror for tests: [(doc_id, n_hits, score_micro, rank)]."""
    import re

    terms = sorted({t.lower() for t in query_terms if t})
    tok = {i: [t for t in re.split(_TOK_SPLIT, txt.lower()) if t]
           for i, txt in docs.items()}
    dl = {i: len(ts) for i, ts in tok.items() if ts}
    n, s = len(docs), sum(dl.values())
    adl = (s * 1_000_000) // n
    out = []
    for i, ts in tok.items():
        hits, score = 0, 0
        for term in terms:
            tf = ts.count(term)
            if not tf:
                continue
            df = sum(1 for ts2 in tok.values() if term in ts2)
            idf = ln_micro_py(2 * n - 2 * df + 1, 2 * df + 1)
            ratio = (22_000_000 * tf) // (
                10 * tf + 3 + (9_000_000 * dl[i]) // adl
            )
            # python // floors; idf·ratio can be negative (df > N/2) —
            # mirror SQL trunc-toward-zero explicitly
            num = idf * ratio
            score += (abs(num) // 1_000_000) * (1 if num >= 0 else -1)
            hits += 1
        if hits:
            out.append((i, hits, score))
    out.sort(key=lambda r: (-r[2], r[0]))
    return [(i, h, sc, rk + 1) for rk, (i, h, sc) in enumerate(out[:k])]
