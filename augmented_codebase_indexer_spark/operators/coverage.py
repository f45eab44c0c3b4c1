"""Span-union coverage — per document, how much of it is covered by the
UNION of a (possibly overlapping, possibly duplicated) span set.  The
QA statistic every span-producing stage needs: share of a doc inside
contaminated eval spans (`operators/decontam.py` emits the spans, this
measures the damage), share covered by PII hits, by quoted near-dup
regions (`operators/dedup.py` containment), by extracted mentions.
Overlap makes naive ``sum(e−s)`` overcount — the union length is the
classic sweep: sort by start, clip each span at the running max of
prior ends.

Exactness: spans are half-open integer ``[s, e)`` token offsets; the
per-span contribution ``greatest(0, e − greatest(s, max_prev_e))`` is
BIGINT, and although tie ORDER between same-start spans is engine-
dependent, the SUM is the union length under any tie order (the sweep
invariant) — so only the per-doc aggregate is emitted, never per-span
rows.  ``share_micro`` is one truncating division against the doc
length; spans beyond the doc length clip to it (a span table from a
stale pass can't push the share past 1e6).

Scale shape at 10^12 spans: ONE doc-partitioned window ordered by
(start, end) with a running max frame — state is O(1) per partition
and partitions are doc-sized; then one map-side-combinable groupBy.
No self-join of the span table (the naive overlap-pairs approach is
quadratic in spans-per-doc), no Python.

Reference anchor: the reference's chunker tracks how much of a file its
extracted chunks cover (`src/aci/core/chunker/chunker.py` span
bookkeeping) — this is that accounting done relationally over any span
relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def span_coverage(
    spans: DataFrame,
    doc_tokens: DataFrame,
    doc_col: str = "doc_id",
    start_col: str = "s",
    end_col: str = "e",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """→ (doc_id, n_spans, covered, n_tokens, share_micro): per doc with
    at least one span, the union length of its clipped span set.

    Degenerate spans (``e <= s``) contribute 0 but still count in
    ``n_spans`` (they attest the producing stage fired).  Docs with no
    spans are absent — LEFT-join downstream if zero rows matter.
    """
    toks = doc_tokens.select(
        F.col(doc_col).alias("doc_id"),
        F.greatest(F.col(tokens_col).cast("long"), F.lit(0)).alias("n_tokens"),
    )
    sp = (
        spans.select(
            F.col(doc_col).alias("doc_id"),
            F.col(start_col).cast("long").alias("s"),
            F.col(end_col).cast("long").alias("e"),
        )
        .join(toks, "doc_id")
        .selectExpr(
            "doc_id", "n_tokens",
            "greatest(least(s, n_tokens), 0) AS s",
            "greatest(least(e, n_tokens), 0) AS e",
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("s").asc(), F.col("e").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    clipped = sp.withColumn(
        "prev_max_e", F.coalesce(F.max("e").over(w), F.lit(0))
    ).selectExpr(
        "doc_id", "n_tokens",
        "greatest(0, e - greatest(s, prev_max_e)) AS contrib",
    )
    return clipped.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum("contrib").alias("covered"),
        F.first("n_tokens").alias("n_tokens"),
    ).selectExpr(
        "doc_id", "n_spans", "covered", "n_tokens",
        f"CASE WHEN n_tokens = 0 THEN 0 "
        f"ELSE covered * {MICRO} DIV n_tokens END AS share_micro",
    )


def span_coverage_oracle_sql(spans_sql: str, doc_tokens_sql: str) -> str:
    """DuckDB mirror — same clipping, same sweep window, same gate."""
    return f"""
    WITH toks AS (SELECT doc_id,
                         greatest(CAST(n_tokens AS BIGINT), 0) AS n_tokens
                  FROM ({doc_tokens_sql})),
    sp AS (
      SELECT p.doc_id, t.n_tokens,
             greatest(least(CAST(p.s AS BIGINT), t.n_tokens), 0) AS s,
             greatest(least(CAST(p.e AS BIGINT), t.n_tokens), 0) AS e
      FROM ({spans_sql}) p JOIN toks t ON t.doc_id = p.doc_id),
    clipped AS (
      SELECT doc_id, n_tokens,
             greatest(0, e - greatest(s, coalesce(max(e) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0))) AS contrib
      FROM sp)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           sum(contrib) AS covered,
           CAST(min(n_tokens) AS BIGINT) AS n_tokens,
           CASE WHEN min(n_tokens) = 0 THEN 0
                ELSE sum(contrib) * {MICRO} // min(n_tokens) END
             AS share_micro
    FROM clipped GROUP BY doc_id
    """
