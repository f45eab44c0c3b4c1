"""Training-mix construction: deterministic sampling and splits for
assembling a training set from a curated corpus.

* ``training_mix`` — per-source token budgets: shuffle each source's docs
  into a deterministic pseudo-random order (60-bit md5 hash of the doc id —
  ``functions/sqlhash.h60_expr``, verified bit-equal Spark vs DuckDB) and
  keep docs until the source's token budget is exhausted. This is the
  "data mixing" step of an LLM pipeline (sample N tokens of web, M of
  reference text, ...) made reproducible: same corpus + same budgets →
  byte-identical mix, no RNG state anywhere.
* ``hash_split`` — stable train/val/test assignment by hash range, the
  standard leakage-safe split (a doc's split never changes as the corpus
  grows, unlike ``randomSplit``).

Scale shape: ``training_mix`` is ONE shuffle (hash-partition by source for
the running-sum window); sources are few and large, so if one source
dominates, the window ordering is the hot spot — mitigate upstream by
sub-bucketing the source key (documented, not needed at test scale).
``hash_split`` is narrow, zero shuffle. Both pure JVM expressions; the
DuckDB oracle replays the identical hash arithmetic, so ordering and
cut-offs match exactly (integer hash ordering, integer token cumsum — no
float comparisons anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.sqlhash import h60_expr


def _priority(id_col: str) -> Column:
    return F.expr(h60_expr(f"cast({id_col} as string)", "spark"))


def training_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Keep, per source, the hash-ordered prefix of docs whose cumulative
    token count stays under that source's budget (the first doc is always
    admitted so a budget smaller than one doc still yields data). Sources
    absent from ``budgets`` are dropped. Returns (doc_id, source, n_tokens,
    mix_order, cum_tokens)."""
    pri = _priority(id_col).alias("__pri")
    w = Window.partitionBy(source_col).orderBy("__pri", id_col)
    budget = F.coalesce(
        *[
            F.when(F.col(source_col) == s, F.lit(int(b)))
            for s, b in sorted(budgets.items())
        ]
        + [F.lit(None).cast("long")]
    )
    out = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
            pri,
        )
        .withColumn("mix_order", F.row_number().over(w).cast("long"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .withColumn("__budget", budget)
    )
    return out.filter(
        F.col("__budget").isNotNull()
        & ((F.col("cum_tokens") - F.col("n_tokens")) < F.col("__budget"))
    ).select("doc_id", "source", "n_tokens", "mix_order", "cum_tokens")


def training_mix_oracle_sql(
    budgets: dict[str, int],
    table: str = "documents",
    tokens_expr: str = "len(string_split(text, ' '))",
) -> str:
    """DuckDB mirror of ``training_mix`` (same hash, same window, same
    budget cut)."""
    h = h60_expr("CAST(doc_id AS VARCHAR)", "duckdb")
    cases = " ".join(
        f"WHEN '{s}' THEN {int(b)}" for s, b in sorted(budgets.items())
    )
    return f"""
    SELECT doc_id, source, n_tokens, mix_order, cum_tokens
    FROM (
      SELECT doc_id, source, n_tokens,
             CAST(row_number() OVER w AS BIGINT) AS mix_order,
             CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
             CASE source {cases} ELSE NULL END AS budget
      FROM (
        SELECT doc_id, source,
               CAST({tokens_expr} AS BIGINT) AS n_tokens, {h} AS pri
        FROM {table})
      WINDOW w AS (PARTITION BY source ORDER BY pri, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    WHERE budget IS NOT NULL AND cum_tokens - n_tokens < budget
    """


def pack_sequences(
    chunks: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    order_col: str = "part_index",
    tokens_col: str = "n_tokens",
    chunk_id_col: str = "chunk_id",
) -> DataFrame:
    """Streaming sequence packing: assign chunks to token-budget bins for
    training-batch assembly. A chunk goes to bin ``floor(cum_before /
    budget)`` of its shard, where ``cum_before`` is the running token sum
    in (doc-hash, part_index) order — so a doc's chunks stay adjacent, a
    bin can overflow by at most one chunk (standard sample-packing slack),
    and the result is a pure function of the input (no RNG, no state).

    Scale shape: packing is per-shard (doc-hash % n_shards), so the window
    never sees more than corpus/n_shards rows — there is NO global-order
    window anywhere (a single ORDER BY over 10^12 chunks would serialize
    onto one task). Bins are independent across shards by construction;
    size n_shards to taste (it only changes which bins chunks share).
    Returns (doc_id, chunk_id, shard, bin_id, offset_tokens, n_tokens)."""
    pri = _priority(id_col)
    shard = F.pmod(pri, F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy("__pri", id_col, order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = chunks.select(
        F.col(id_col).alias("doc_id"),
        F.col(chunk_id_col).alias("chunk_id"),
        F.col(order_col).alias(order_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        pri.alias("__pri"),
        shard.alias("shard"),
    ).withColumn("__cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return out.select(
        "doc_id", "chunk_id", "shard",
        F.floor(F.col("__cum_before") / budget).cast("long").alias("bin_id"),
        (F.col("__cum_before") % budget).cast("long").alias("offset_tokens"),
        "n_tokens",
    )


def pack_sequences_oracle_sql(
    budget: int = 2048,
    n_shards: int = 64,
    chunks_table: str = "chunks",
) -> str:
    """DuckDB mirror of ``pack_sequences`` over a table with columns
    (doc_id, chunk_id, part_index, n_tokens)."""
    h = h60_expr("CAST(doc_id AS VARCHAR)", "duckdb")
    return f"""
    SELECT doc_id, chunk_id, shard,
           CAST(floor(CAST(cum_before AS DOUBLE) / {budget}) AS BIGINT) AS bin_id,
           CAST(cum_before % {budget} AS BIGINT) AS offset_tokens,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM (
      SELECT doc_id, chunk_id, n_tokens, shard,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY pri, doc_id, part_index
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM (
        SELECT doc_id, chunk_id, part_index, n_tokens, {h} AS pri,
               CAST({h} % {n_shards} AS INT) AS shard
        FROM {chunks_table})
    )
    """


def domain_cap(
    docs: DataFrame,
    k: int,
    domain_col: str = "source",
    quality_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain quota: keep at most ``k`` docs per domain — the standard
    crawl-balance pass (one link-farm domain must not dominate the mix).
    Best-first when ``quality_col`` is given (ties broken by id), else a
    deterministic hash order (uniform per-domain sample, reproducible).
    One shuffle, keyed by domain; skew = a pathologically hot domain,
    which is exactly what the cap then truncates. Returns the surviving
    rows plus their ``domain_rank``."""
    if quality_col is not None:
        order = [F.desc(quality_col), F.asc(id_col)]
        pri = []
    else:
        order = [F.asc("__pri"), F.asc(id_col)]
        pri = [_priority(id_col).alias("__pri")]
    w = Window.partitionBy(domain_col).orderBy(*order)
    out = (
        docs.select("*", *pri)
        .withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("domain_rank") <= k)
    )
    return out.drop("__pri") if pri else out


def domain_cap_oracle_sql(
    k: int,
    table: str = "documents",
    quality_expr: str | None = None,
) -> str:
    """DuckDB mirror of ``domain_cap`` over (doc_id, source, ...); hash
    order when ``quality_expr`` is None."""
    if quality_expr is not None:
        order = f"{quality_expr} DESC, doc_id ASC"
    else:
        h = h60_expr("CAST(doc_id AS VARCHAR)", "duckdb")
        order = f"{h} ASC, doc_id ASC"
    return f"""
    SELECT doc_id, source, domain_rank FROM (
      SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source ORDER BY {order})
                  AS BIGINT) AS domain_rank
      FROM {table})
    WHERE domain_rank <= {k}
    """


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """Adds a stable ``split`` column (train/val/test) from the doc-id hash
    modulo 100 — membership is a pure function of the id, so re-running
    over a grown corpus never moves an old doc across splits."""
    bucket = _priority(id_col) % 100
    return df.withColumn(
        "split",
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def hash_split_oracle_sql(
    val_pct: int = 10, test_pct: int = 10, table: str = "documents"
) -> str:
    """DuckDB mirror: per-(source, split) doc and token totals."""
    h = h60_expr("CAST(doc_id AS VARCHAR)", "duckdb")
    return f"""
    SELECT source, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM (
      SELECT source, text,
             CASE WHEN {h} % 100 < {val_pct} THEN 'val'
                  WHEN {h} % 100 < {val_pct + test_pct} THEN 'test'
                  ELSE 'train' END AS split
      FROM {table})
    GROUP BY source, split
    """
