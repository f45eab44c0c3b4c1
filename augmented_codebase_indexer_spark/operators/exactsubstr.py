"""ExactSubstr: cross-document substring excision — the published dedup
tier (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better", §4.1 ExactSubstr with 50-token windows) that removes long
substrings repeated VERBATIM across different training documents while
keeping the surrounding text. Doc-level dedup misses a boilerplate
paragraph pasted into otherwise-distinct pages; ExactSubstr excises
exactly the repeated span.

Composition of two machines that already exist in this package (VERDICT
r3 Missing #3): ``decontam.decontaminate_spans``'s per-position window
hashing / span excision, with the "eval set" replaced by a corpus-global
gram-frequency pass shaped like ``curation_filters``' segment-df state —
an n-token window whose 60-bit hash occurs in ≥ ``min_df`` DISTINCT
documents is a repeated substring. With ``keep_first`` (the published
keep-one-copy semantics) the smallest doc_id containing a repeated gram
is its OWNER and keeps its occurrences; every other document excises the
covered tokens. Within-document repeats (df = 1) are Gopher repetition
territory (``curation_filters.repetition_stats``), not this pass.

Scale shape (the part that must survive 100 TB):
* per-position hashes are a NARROW transform (no text in any exchange);
* the frequency pass shuffles slim (doc_id, gram_h) pairs with map-side
  combine — the same cost class as the boilerplate segment-df pass;
* only positions of grams that cleared min_df survive the join back, a
  set bounded by repeated content, re-joined under the counted broadcast
  guard (``operators/guards.py``) so a boilerplate-heavy crawl degrades
  to a shuffled join instead of OOMing the driver.

No UDFs; the DuckDB oracle replays the hash pipeline byte-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.sqlhash import h60_expr
from .guards import DEFAULT_BROADCAST_MAX_ROWS, guarded_broadcast, register_pin


def _pos_hash_expr(text_col: str, n: int) -> str:
    """Spark SQL: array<struct<i:int, gram_h:bigint>> of per-position
    n-token window hashes (1-based i; empty for docs shorter than n —
    NB Spark ``sequence(1, 0)`` DESCENDS, hence the CASE guard)."""
    toks = f"split({text_col}, ' ')"
    win = f"concat_ws(' ', slice({toks}, i, {n}))"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> struct(i AS i, {h60_expr(win, 'spark')} AS gram_h)) "
        f"ELSE array() END"
    )


def repeated_gram_owners(
    docs: DataFrame, n: int = 50, min_df: int = 2,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(gram_h, df, owner): the n-gram hashes occurring in ≥ ``min_df``
    distinct docs, with the smallest containing doc_id as owner — the
    corpus-global frequency pass (one slim-pair shuffle)."""
    posh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(_pos_hash_expr(text_col, n))).alias("ph"),
    ).select("doc_id", F.col("ph.gram_h").alias("gram_h"))
    return (
        posh.groupBy("gram_h")
        .agg(
            F.count_distinct("doc_id").alias("df"),
            F.min("doc_id").alias("owner"),
        )
        .filter(F.col("df") >= min_df)
    )


def exact_substr_spans(
    docs: DataFrame, n: int = 50, min_df: int = 2, keep_first: bool = True,
    id_col: str = "doc_id", text_col: str = "text",
    broadcast_max_rows: int | None = DEFAULT_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Excise every token covered by an n-token window repeated across
    ≥ ``min_df`` distinct documents; with ``keep_first`` the min-doc_id
    owner of each repeated gram keeps its occurrences (one surviving copy
    corpus-wide — the published semantics), else ALL occurrences go.

    Returns (doc_id, clean_text, n_tokens_removed, n_hit_spans) for every
    input doc; docs shorter than n tokens pass through unchanged."""
    # ONE per-position hash explode feeds BOTH the frequency pass and the
    # hits join — the tokenize+hash transform is the operator's dominant
    # cost, and without the persist each consumer would recompute it
    posh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(_pos_hash_expr(text_col, n))).alias("ph"),
    ).select("doc_id", F.col("ph.i").alias("i"),
             F.col("ph.gram_h").alias("gram_h")).persist()
    register_pin(posh)
    repeated = (
        posh.groupBy("gram_h")
        .agg(
            F.count_distinct("doc_id").alias("df"),
            F.min("doc_id").alias("owner"),
        )
        .filter(F.col("df") >= min_df)
    )
    hits = posh.join(
        guarded_broadcast(repeated.select("gram_h", "owner"),
                          broadcast_max_rows),
        "gram_h",
    )
    if keep_first:
        hits = hits.filter(F.col("doc_id") != F.col("owner"))
    starts = (
        hits.groupBy("doc_id")
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


def exact_substr_oracle_sql(
    n: int, min_df: int = 2, keep_first: bool = True,
    table: str = "documents", pred: str = "TRUE",
) -> str:
    """DuckDB mirror of ``exact_substr_spans`` — same 60-bit window
    hashes, same ownership rule, same excision arithmetic."""
    h = h60_expr("array_to_string(toks[i : i + " + str(n - 1) + "], ' ')",
                 "duckdb")
    own = "AND p.doc_id <> r.owner" if keep_first else ""
    return f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS nt
      FROM {table} WHERE {pred}
    ),
    posh AS (
      SELECT doc_id, CAST(i AS INT) AS i, {h} AS gram_h
      FROM base, unnest(range(1, greatest(nt - {n - 1}, 0) + 1)) AS r(i)
    ),
    rep AS (
      SELECT gram_h, min(doc_id) AS owner
      FROM posh GROUP BY gram_h
      HAVING count(DISTINCT doc_id) >= {min_df}
    ),
    st AS (
      SELECT p.doc_id, list_sort(list(DISTINCT p.i)) AS starts
      FROM posh p JOIN rep r USING (gram_h)
      WHERE TRUE {own}
      GROUP BY p.doc_id
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
