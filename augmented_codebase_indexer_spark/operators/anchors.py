"""Anchor-text profiles — link-based naming signals per target URL.

The text INSIDE ``<a>`` tags pointing at a page is a classic
description of what that page IS (Craswell, Hawking & Robertson,
SIGIR'01 "Effective site finding using link anchor information";
anchor signals feed entity naming/aliasing in public web-KG builds).
The reference's analog is import-edge extraction
(`core/chunker/import_extractors.py`), which keeps only the target;
a web KG also wants the anchor words — they become candidate aliases
for the gazetteer tier.

* :func:`anchor_texts` — (src_url, href, anchor) from raw html, the
  anchor-text sibling of ``functions/textextract.outlink_edges`` (and
  like it, runs BEFORE boilerplate stripping: nav anchors are exactly
  what the text extractor deletes). One narrow whole-stage-codegen
  projection: decode + regexp_extract_all + explode, zero Python, zero
  exchanges.
* :func:`anchor_profile` — top-k anchor TERMS per target:
  lowercase, split on non-alphanumerics, count per (href, term)
  (map-side combined — mega-hub targets pre-aggregate before the
  exchange), then row_number ≤ k over the counted rows. The rank
  window partitions by href over DISTINCT TERMS (vocabulary-bounded),
  never over raw anchor occurrences — the same bounded-window
  discipline as the vocab top-K in ``lmquality``.

Counts are BIGINT and ties break (count DESC, term ASC), so the
DuckDB oracle is exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_A_RE = r'<a href="([^"]+)">([^<]*)</a>'
_TOK_SPLIT = "[^a-z0-9]+"


def anchor_texts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, href, anchor) — one row per ``<a>`` occurrence."""
    html_str = F.decode(F.col(html_col), "UTF-8")
    return (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.explode(
                F.regexp_extract_all(html_str, F.lit(_A_RE), F.lit(0))
            ).alias("m"),
        )
        .select(
            "src_url",
            F.regexp_extract("m", _A_RE, 1).alias("href"),
            F.regexp_extract("m", _A_RE, 2).alias("anchor"),
        )
    )


def anchor_profile(anchors: DataFrame, k: int = 3) -> DataFrame:
    """(href, tok, n, rank) — the k most frequent anchor terms per
    target, rank 1-based by (n DESC, tok ASC)."""
    toks = anchors.select(
        "href",
        F.explode(F.split(F.lower("anchor"), _TOK_SPLIT)).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("href", "tok").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("href").orderBy(F.desc("n"), F.asc("tok"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def mention_commonness(
    anchors: DataFrame, min_links: int = 1
) -> DataFrame:
    """(mention, href, n, n_total, commonness_micro, rank) — the
    COMMONNESS prior P(target | mention) of wikification (Milne &
    Witten CIKM'08; Medelyan et al.): across the whole link graph, how
    often does this exact anchor phrase point at each target? rank 1 =
    the prior disambiguation; the full ranked table is the candidate
    set an entity linker scores further.

    The mention is the WHOLE normalized anchor phrase (lowercased,
    whitespace collapsed), not its terms — 'paris hilton' and 'paris'
    are different mentions with different priors. ``commonness_micro``
    = (n·1e6) DIV n_total: one truncating integer division, exact in
    both engines. ``min_links`` prunes sub-threshold candidates AFTER
    totals are counted (the prior's denominator stays honest).

    Scale: one (mention, href) groupBy (map-side combined), one
    mention-keyed total, one window over DISTINCT candidates per
    mention (candidate-vocabulary bounded, never raw occurrences)."""
    m = (
        anchors.select(
            F.regexp_replace(F.trim(F.lower("anchor")), r"\s+", " ").alias(
                "mention"
            ),
            "href",
        )
        .filter(F.col("mention") != "")
    )
    pair = m.groupBy("mention", "href").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = pair.groupBy("mention").agg(
        F.sum("n").cast("long").alias("n_total")
    )
    w = Window.partitionBy("mention").orderBy(F.desc("n"), F.asc("href"))
    return (
        pair.join(tot, "mention")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("n") >= min_links)
        .selectExpr(
            "mention", "href", "n", "n_total",
            "(n * 1000000) DIV n_total AS commonness_micro", "rank",
        )
    )


def mention_commonness_sql(anchors_sql: str, min_links: int = 1) -> str:
    """DuckDB mirror over a closed-form (href, anchor) relation."""
    return f"""
    WITH a AS (SELECT href, anchor FROM ({anchors_sql})),
    m AS (
      SELECT regexp_replace(trim(lower(anchor)), '\\s+', ' ', 'g') AS mention,
             href
      FROM a),
    pair AS (
      SELECT mention, href, CAST(count(*) AS BIGINT) AS n
      FROM m WHERE mention <> '' GROUP BY mention, href),
    tot AS (
      SELECT mention, CAST(sum(n) AS BIGINT) AS n_total
      FROM pair GROUP BY mention),
    r AS (
      SELECT pair.mention, pair.href, pair.n, tot.n_total,
             CAST(row_number() OVER (
               PARTITION BY pair.mention
               ORDER BY pair.n DESC, pair.href ASC) AS BIGINT) AS rank
      FROM pair JOIN tot USING (mention))
    SELECT mention, href, n, n_total,
           (n * 1000000) // n_total AS commonness_micro, rank
    FROM r WHERE n >= {min_links}
    """


def anchor_profile_sql(anchors_sql: str, k: int = 3) -> str:
    """DuckDB mirror over a closed-form (href, anchor) relation."""
    return f"""
    WITH a AS (SELECT href, anchor FROM ({anchors_sql})),
    toks AS (
      SELECT href,
             unnest(string_split_regex(lower(anchor), '{_TOK_SPLIT}')) AS tok
      FROM a),
    c AS (
      SELECT href, tok, CAST(count(*) AS BIGINT) AS n
      FROM toks WHERE tok <> '' GROUP BY href, tok),
    r AS (
      SELECT href, tok, n,
             CAST(row_number() OVER (
               PARTITION BY href ORDER BY n DESC, tok ASC) AS BIGINT) AS rank
      FROM c)
    SELECT href, tok, n, rank FROM r WHERE rank <= {k}
    """
