"""Per-host template-paragraph detection — the cross-document half of
boilerplate removal (Gibson/Punera/Tomkins WWW'05 "The volume and
evolution of web page templates"; the CleanEval/Boilerpipe line uses
per-page markup features, `functions/textextract.py` holds that tier).
A paragraph that recurs on a large share of one host's pages is site
furniture (nav text, cookie banners, footers), not content — detect it
by counting, then strip it corpus-wide.

Exactness: BIGINT document counts per (host, paragraph) against the
host's document total; the verdict is the integer cross-multiply
``n_docs · den ≥ n_host_docs · num AND n_docs ≥ min_docs`` — no rates
in the gate; ``share_micro`` is one truncating division for display.

Scale shape at 10^12 docs: the paragraph relation collapses to DISTINCT
(host, para, doc) map-side, then one (host, para) groupBy; host totals
aggregate host-sized rows and join back broadcast (hosts ≪ paragraphs).
Paragraph text crosses the exchange once — production would key by a
paragraph HASH and join text back at the end; the hash variant is the
same plan with a narrower key (``functions/sqlhash.py::h60_expr``).

Reference anchor: the reference strips repeated boilerplate regions
before chunking so embeddings index content, not chrome
(`src/aci/core/chunker/chunker.py` pre-clean) — this is the
evidence-driven, per-site form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_templates(
    paras: DataFrame,
    min_docs: int = 2,
    share: tuple[int, int] = (1, 2),
    host_col: str = "host",
    doc_col: str = "doc_id",
    para_col: str = "para",
) -> DataFrame:
    """→ (host, para, n_docs, n_host_docs, share_micro, is_template):
    per host and distinct paragraph, how many of the host's documents
    contain it; template when the share reaches ``share`` = (num, den)
    AND at least ``min_docs`` documents attest it."""
    num, den = share
    if num <= 0 or den <= 0 or min_docs < 1:
        raise ValueError("host_templates: share and min_docs must be positive")
    hp = paras.select(
        F.col(host_col).alias("host"),
        F.col(doc_col).alias("doc_id"),
        F.col(para_col).alias("para"),
    ).distinct()
    counts = hp.groupBy("host", "para").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    totals = (
        hp.select("host", "doc_id")
        .distinct()
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_host_docs"))
    )
    return counts.join(F.broadcast(totals), "host").selectExpr(
        "host", "para", "n_docs", "n_host_docs",
        "n_docs * 1000000 DIV n_host_docs AS share_micro",
        f"n_docs * {den} >= n_host_docs * {num} AND n_docs >= {min_docs}"
        " AS is_template",
    )


def host_templates_oracle_sql(
    paras_sql: str = "SELECT host, doc_id, para FROM paras",
    min_docs: int = 2,
    share: tuple[int, int] = (1, 2),
) -> str:
    """DuckDB mirror: same distinct grain, same cross-multiply."""
    num, den = share
    return f"""
    WITH hp AS (SELECT DISTINCT host, doc_id, para FROM ({paras_sql})),
    counts AS (
      SELECT host, para, CAST(count(*) AS BIGINT) AS n_docs
      FROM hp GROUP BY host, para),
    totals AS (
      SELECT host, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_host_docs
      FROM hp GROUP BY host)
    SELECT host, para, n_docs, n_host_docs,
           n_docs * 1000000 // n_host_docs AS share_micro,
           n_docs * {den} >= n_host_docs * {num} AND n_docs >= {min_docs}
             AS is_template
    FROM counts JOIN totals USING (host)
    """
