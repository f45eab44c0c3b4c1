"""Corpus concentration metrics — Gini coefficient, inverse-Simpson
effective-source count, and top-1 share over a (key, weight) relation,
all exact integers.

Web-corpus health reporting (the C4/RefinedWeb-style "how dominated is
the corpus by its biggest domains" table) needs concentration numbers,
and both classics are exact integer rationals once cross-multiplied:

- Gini over sorted weights x_(1) ≤ … ≤ x_(n) (Lorenz form):
      G = (2·Σ i·x_(i) − (n+1)·S) / (n·S)
  one rank window over KEY-grain rows (hosts, not documents) and one
  fold; ties in weight are broken by key text so the rank — and hence
  the gate — is deterministic (Σ i·x_i over a tie group is invariant
  to order anyway, but the discipline costs nothing).
- Inverse Simpson (effective number of sources, Hill number q=2):
      ENS = S² / Σ x_i²
  the "how many equal-sized hosts would look like this" number.
- top_share: the largest key's exact micro share.

Overflow bounds (documented, not silent): Σ i·x_i ≤ n·S needs
n·S < 2^63 (10^6 hosts × 10^12 tokens is over — fold weights to
coarser units first); ENS needs S < 3·10^9 in the chosen unit.

Scale shape: the input is already key-grain (one upstream groupBy);
the rank window runs over key cardinality, the folds are single
aggregates. Gini of 10^7 hosts is one narrow sort.

Reference anchor: the reference reports per-language chunk counts
(`core/indexer` stats); this adds the inequality measures those
counts hide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def concentration(weights: DataFrame, key_col: str = "key",
                  weight_col: str = "w") -> DataFrame:
    """weights(key, w ≥ 0) → ONE row: (n_keys, total, gini_micro,
    effective_keys_micro, top_share_micro)."""
    d = weights.select(F.col(key_col).alias("k"),
                       F.col(weight_col).cast("long").alias("x"))
    ranked = d.withColumn(
        "i", F.row_number().over(Window.orderBy("x", "k")).cast("long"))
    return ranked.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("x").cast("long").alias("total"),
        F.sum(F.expr("i * x")).cast("long").alias("_ix"),
        F.sum(F.expr("x * x")).cast("long").alias("_xx"),
        F.max("x").cast("long").alias("_mx"),
    ).selectExpr(
        "n_keys", "total",
        "CASE WHEN n_keys <= 1 OR total = 0 THEN NULL"
        f" ELSE (2 * _ix - (n_keys + 1) * total) * {MICRO}"
        " DIV (n_keys * total) END AS gini_micro",
        "CASE WHEN _xx = 0 THEN NULL"
        f" ELSE total * total * {MICRO} DIV _xx"
        " END AS effective_keys_micro",
        "CASE WHEN total = 0 THEN NULL"
        f" ELSE _mx * {MICRO} DIV total END AS top_share_micro",
    )


def concentration_oracle_sql(weights_sql: str) -> str:
    """DuckDB mirror over a relation exposing (key, w)."""
    return f"""
    WITH d AS (SELECT key AS k, CAST(w AS BIGINT) AS x
               FROM ({weights_sql})),
    ranked AS (
      SELECT k, x, CAST(row_number() OVER (ORDER BY x, k) AS BIGINT)
             AS i
      FROM d),
    fold AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(x) AS BIGINT) AS total,
             CAST(sum(i * x) AS BIGINT) AS _ix,
             CAST(sum(x * x) AS BIGINT) AS _xx,
             CAST(max(x) AS BIGINT) AS _mx
      FROM ranked)
    SELECT n_keys, total,
           CASE WHEN n_keys <= 1 OR total = 0 THEN NULL
                ELSE (2 * _ix - (n_keys + 1) * total) * {MICRO}
                     // (n_keys * total) END AS gini_micro,
           CASE WHEN _xx = 0 THEN NULL
                ELSE total * total * {MICRO} // _xx
           END AS effective_keys_micro,
           CASE WHEN total = 0 THEN NULL
                ELSE _mx * {MICRO} // total END AS top_share_micro
    FROM fold
    """
