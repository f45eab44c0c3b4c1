"""TF-IDF keyword extraction — top-k characteristic terms per document.

The classic document-descriptor (Spärck Jones 1972; the tf·idf
weighting every search/labeling stack starts from): terms frequent in
THIS doc but rare in the corpus. The reference's analog is the symbol
ranking inside summaries; the web form feeds doc labeling, facet
suggestion, and the summary templates.

Exactness: ``idf_micro = ln_micro(N / df)`` via the LIBM-FREE
fixed-point integer log (``functions/intlog.py`` — pure BIGINT shift/
multiply/divide, bit-identical across engines by construction; r6
replaced the libm ``round(1e6·ln(N/df))`` quantize-once, which was
exact only as long as both engines' libm builds agreed — VERDICT r5
Next #1 sweep). Everything downstream is exact BIGINT
(``score_micro = tf · idf_micro``, rank by (score desc, term asc)).

Shape: tf is one (doc, term) groupBy (map-side combined); df is one
vocabulary-bounded groupBy; idf joins back through the counted
broadcast guard; the top-k filter plans as WindowGroupLimit, so
per-doc window state is O(k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.intlog import duckdb_ln_micro_sql, with_ln_micro
from .guards import guarded_broadcast

_TOK_SPLIT = "[^a-z0-9]+"


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs → (doc_id, term, tf, df, score_micro, rank): the k highest
    tf·idf terms per doc, rank 1-based by (score_micro desc, term)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.col(text_col)), _TOK_SPLIT)
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    n_docs = docs.select(id_col).distinct().count()
    df_t = with_ln_micro(
        toks.select("doc_id", "term").distinct()
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df")),
        str(n_docs), "df", "idf_micro",
    )
    scored = tf.join(guarded_broadcast(df_t), "term").select(
        "doc_id", "term", "tf", "df",
        (F.col("tf") * F.col("idf_micro")).alias("score_micro"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def tfidf_keywords_sql(
    k: int = 5, docs_sql: str = "SELECT doc_id, text FROM documents"
) -> str:
    """DuckDB mirror — identical tokenization, quantization, tie-break."""
    return f"""
    WITH d AS ({docs_sql}),
    toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '{_TOK_SPLIT}')) AS term
      FROM d),
    tok AS (SELECT * FROM toks WHERE term <> ''),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, term),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM d),
    dft AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY term),
    idf AS ({duckdb_ln_micro_sql(
        "SELECT term, df, nd.n FROM dft CROSS JOIN nd",
        "n", "df", "idf_micro", keep_cols="term, df")}),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, idf.df,
             tf.tf * idf.idf_micro AS score_micro
      FROM tf JOIN idf ON idf.term = tf.term),
    ranked AS (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY score_micro DESC, term ASC) AS BIGINT)
        AS rank
      FROM scored)
    SELECT doc_id, term, tf, df, score_micro, rank
    FROM ranked WHERE rank <= {k}
    """
