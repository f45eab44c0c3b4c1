"""Edit-distance name blocking — entity-resolution candidate pairs via
multi-key blocking + Levenshtein verification, with the standard
blocking-quality metrics.

The classic ER blocking scheme (Fellegi & Sunter JASA'69 framing;
blocking survey Papadakis et al. CSUR'20): comparing all name pairs is
O(n²) and dead at web scale, so each record emits a small set of
BLOCKING KEYS (here: normalized 2-char prefix and 2-char suffix), only
pairs sharing a key are compared, and the comparison is exact
Levenshtein distance (both engines' built-in `levenshtein` — probed
identical across ASCII and multi-byte inputs). Two-end keys catch any
single-region edit ≤ ``max_dist`` (an edit window can destroy one end,
not both); names edited at BOTH ends are the documented miss class —
which is why :func:`blocking_quality` reports PAIR COMPLETENESS
(recall of true pairs) next to REDUCTION RATIO (fraction of the n²
comparisons avoided), the two numbers every blocking paper leads with.

Oversized blocks (stopword-like keys: 'co' over a corpus of companies)
are dropped whole when they exceed ``block_cap`` — count-based, hence
deterministic and mirrored in the oracle; the drop is the standard
scale move (a key shared by 10^6 names carries no discriminative
signal and 10^12 comparisons).

Everything is engine-identical by construction: lower/substr/length
string keys, integer Levenshtein, integer micro metrics — no regex, no
float anywhere.

Scale shape at 10^10 records: keys explode ×2, one key-grain self-join
whose fan-out is bounded by block_cap² per key, verification at
candidate (not pair-space) grain, pair dedup on (id_a, id_b). The
quality fold is three single-row aggregates cross-joined (1-row
frames).

Reference anchor: the reference resolves mention aliases against a
candidate index before scoring (`core/linker`); this is the
candidate-generation tier for name-grain ER with its quality
instrumentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _keys(names: DataFrame, block_cap: int) -> DataFrame:
    k1 = F.concat(F.lit("p:"), F.lower(F.expr("substr(name, 1, 2)")))
    k2 = F.concat(
        F.lit("s:"),
        F.lower(F.expr("substr(name, greatest(length(name) - 1, 1), 2)")),
    )
    keyed = names.select(
        "id", "name", F.explode(F.array(k1, k2)).alias("bkey")
    ).distinct()
    ok = (
        keyed.groupBy("bkey")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") <= block_cap)
        .select("bkey")
    )
    return keyed.join(ok, "bkey")


def block_candidates(
    names: DataFrame, max_dist: int = 2, block_cap: int = 1000
) -> DataFrame:
    """names(id, name) → (id_a, id_b, name_a, name_b, dist): pairs
    sharing a surviving blocking key with levenshtein ≤ max_dist,
    id_a < id_b, deduped across keys."""
    k = _keys(names, block_cap)
    a = k.select(
        F.col("bkey"), F.col("id").alias("id_a"), F.col("name").alias("name_a")
    )
    b = k.select(
        F.col("bkey"), F.col("id").alias("id_b"), F.col("name").alias("name_b")
    )
    pairs = (
        a.join(b, "bkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    return pairs.withColumn(
        "dist", F.levenshtein("name_a", "name_b").cast("long")
    ).filter(F.col("dist") <= max_dist)


def blocking_quality(
    cands: DataFrame, truth: DataFrame, names: DataFrame
) -> DataFrame:
    """One row: (n_records, n_total_pairs, n_candidates, n_true,
    n_found, pair_completeness_micro, reduction_ratio_micro). truth is
    (id_a, id_b) with id_a < id_b."""
    n_rec = names.agg(F.count("*").cast("long").alias("n_records"))
    n_cand = cands.agg(F.count("*").cast("long").alias("n_candidates"))
    t = truth.select("id_a", "id_b").distinct()
    n_true = t.agg(F.count("*").cast("long").alias("n_true"))
    n_found = (
        t.join(cands.select("id_a", "id_b"), ["id_a", "id_b"])
        .agg(F.count("*").cast("long").alias("n_found"))
    )
    return (
        n_rec.crossJoin(n_cand).crossJoin(n_true).crossJoin(n_found)
        .selectExpr(
            "n_records",
            "n_records * (n_records - 1) DIV 2 AS n_total_pairs",
            "n_candidates", "n_true", "n_found",
            f"n_found * {MICRO} DIV n_true AS pair_completeness_micro",
            f"{MICRO} - n_candidates * {MICRO}"
            " DIV (n_records * (n_records - 1) DIV 2)"
            " AS reduction_ratio_micro",
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors
# ---------------------------------------------------------------------------

def _keys_sql(names_sql: str, block_cap: int) -> str:
    return f"""
    WITH nm AS MATERIALIZED (SELECT id, name FROM ({names_sql})),
    keyed AS MATERIALIZED (
      SELECT DISTINCT id, name, bkey FROM (
        SELECT id, name, 'p:' || lower(substr(name, 1, 2)) AS bkey FROM nm
        UNION ALL
        SELECT id, name,
               's:' || lower(substr(name, greatest(length(name) - 1, 1), 2))
        FROM nm)),
    ok AS (SELECT bkey FROM keyed GROUP BY bkey
           HAVING CAST(count(*) AS BIGINT) <= {block_cap})
    SELECT keyed.* FROM keyed JOIN ok USING (bkey)
    """


def block_candidates_oracle_sql(
    names_sql: str, max_dist: int = 2, block_cap: int = 1000
) -> str:
    """Mirror of :func:`block_candidates`."""
    return f"""
    WITH k AS MATERIALIZED ({_keys_sql(names_sql, block_cap)}),
    pairs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             a.name AS name_a, b.name AS name_b
      FROM k a JOIN k b ON a.bkey = b.bkey AND a.id < b.id)
    SELECT id_a, id_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
    FROM pairs WHERE levenshtein(name_a, name_b) <= {max_dist}
    """


def blocking_quality_oracle_sql(
    names_sql: str, truth_sql: str, max_dist: int = 2, block_cap: int = 1000
) -> str:
    """Mirror of :func:`blocking_quality` over the candidate mirror."""
    return f"""
    WITH cands AS MATERIALIZED (
      {block_candidates_oracle_sql(names_sql, max_dist, block_cap)}),
    t AS (SELECT DISTINCT id_a, id_b FROM ({truth_sql})),
    n_rec AS (SELECT CAST(count(*) AS BIGINT) AS n_records
              FROM ({names_sql})),
    n_cand AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cands),
    n_true AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM t),
    n_found AS (SELECT CAST(count(*) AS BIGINT) AS n_found
                FROM t JOIN cands USING (id_a, id_b))
    SELECT n_records,
           n_records * (n_records - 1) // 2 AS n_total_pairs,
           n_candidates, n_true, n_found,
           n_found * {MICRO} // n_true AS pair_completeness_micro,
           {MICRO} - n_candidates * {MICRO}
             // (n_records * (n_records - 1) // 2)
             AS reduction_ratio_micro
    FROM n_rec, n_cand, n_true, n_found
    """
