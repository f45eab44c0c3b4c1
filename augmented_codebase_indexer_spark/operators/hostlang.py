"""Host-language consistency — per host, the modal document language
and the documents that diverge from it.  The crawl-QA screen behind
CCNet-style per-language corpus slicing (Wenzek et al. LREC'20 §3
partitions the crawl by LID BEFORE everything else): a host whose
pages scatter across languages is either genuinely multilingual
(subdomain routing the canonicalizer should split), a template site
whose boilerplate drowns the LID signal, or a mis-identified script —
all three are worth a human look before the slice quotas are trusted.

Exactness: counts are BIGINT; the modal language is a min(struct)
argmax (count desc, language asc — deterministic); ``outlier_share
_micro`` is one truncating division; ``is_mixed`` is the strict
integer majority test ``2·n_top <= n_docs`` (no language holds a
strict majority → the host is flagged mixed).

Scale shape at 10^10 pages: one (host, lang) groupBy collapses the
corpus map-side (≤ languages rows per host survive the exchange), one
host-keyed argmax fold — no window, no join back to the page set;
per-page outlier LISTS are the caller's join (host, majority) back to
the pages, kept out of this aggregate on purpose.

Reference anchor: the reference tracks per-language file counts in its
index status (`src/aci/services/indexing_service.py` language metrics)
— this is that report with the consistency verdict attached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def host_language_profile(
    docs: DataFrame,
    host_col: str = "host",
    lang_col: str = "lang",
) -> DataFrame:
    """→ (host, n_docs, majority_lang, n_majority, n_outliers,
    outlier_share_micro, is_mixed): per host, the modal language and
    how much of the host disagrees with it."""
    per_lang = docs.select(
        F.col(host_col).alias("host"), F.col(lang_col).alias("lang")
    ).groupBy("host", "lang").agg(F.count("*").cast("long").alias("c"))
    return (
        per_lang.groupBy("host")
        .agg(
            F.sum("c").alias("n_docs"),
            F.min(F.struct((-F.col("c")).alias("nc"),
                           F.col("lang").alias("l"))).alias("w"),
        )
        .selectExpr(
            "host", "n_docs", "w.l AS majority_lang", "-w.nc AS n_majority",
            "n_docs - (-w.nc) AS n_outliers",
            f"(n_docs - (-w.nc)) * {MICRO} DIV n_docs AS outlier_share_micro",
            "2 * (-w.nc) <= n_docs AS is_mixed",
        )
    )


def host_language_profile_sql(docs_sql: str) -> str:
    """DuckDB mirror: same grouping, same min-struct argmax, same
    strict-majority mixed gate."""
    return f"""
    WITH per_lang AS (
      SELECT host, lang, CAST(count(*) AS BIGINT) AS c
      FROM ({docs_sql}) GROUP BY host, lang),
    agg AS (
      SELECT host, sum(c) AS n_docs, min(ROW(-c, lang)) AS w
      FROM per_lang GROUP BY host)
    SELECT host, n_docs, w[2] AS majority_lang, -w[1] AS n_majority,
           n_docs - (-w[1]) AS n_outliers,
           (n_docs - (-w[1])) * {MICRO} // n_docs AS outlier_share_micro,
           2 * (-w[1]) <= n_docs AS is_mixed
    FROM agg
    """
