"""Deterministic filtered negative sampling for KG-embedding training
(Bordes et al., TransE NIPS'13 §3 "corrupted triplets", the FILTERED
protocol of Bordes'13/Dettmers'18: corruptions that happen to be true
triples are removed, not scored as negatives). Like the walk corpus
(``operators/walks.py``), negatives are TRAINING DATA, so they get the
full cross-engine oracle gate — which rules out RNG state: the
"random" replacement object is the md5 ``H60`` hash of
(subj, pred, obj, seed, j) reduced mod the pool size, bit-identical in
both engines, reproducible at any parallelism, restartable mid-corpus.

Corruption is TYPE-CONSISTENT: the replacement pool for a triple is the
distinct objects OF ITS OWN PREDICATE (corrupting born_in with an
employer teaches the model nothing — the within-relation pool is the
hard-negative convention). Self-corruptions (cand == obj) and true
triples are filtered AFTER generation, so some (triple, j) slots drop —
the standard oversample-then-filter protocol; callers ask for k+slack.

Scale shape: the pool index is a per-predicate window over the DISTINCT
object vocabulary (vocabulary-bounded, never raw triples); at web scale
the indexed pool is materialized ONCE and reused across epochs — it is
an offline artifact, not a per-batch cost. Generation is one explode
(k rows per distinct triple), one (pred, idx) equi-join against the
pool, and one left-anti join against the triple set itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sqlhash import h60_expr


def _choice_key(dialect: str, seed: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return (
        f"concat(subj, '#', pred, '#', obj, '#', '{seed}', '#', "
        f"CAST(j AS {s}))"
    )


def negative_samples(
    triples: DataFrame, k: int = 2, seed: str = "n0"
) -> DataFrame:
    """→ (subj, pred, obj, j, neg_obj): up to ``k`` type-consistent
    corrupted objects per DISTINCT input triple (set semantics — the KG
    edge set, not its extraction multiplicity); slots whose hash-chosen
    candidate equals the true object or forms another true triple are
    dropped (filtered protocol)."""
    if k < 1:
        raise ValueError("negative_samples: k must be >= 1")
    t = triples.select("subj", "pred", "obj").distinct()
    pool = t.select("pred", F.col("obj").alias("cand")).distinct()
    w = Window.partitionBy("pred").orderBy(F.asc("cand"))
    pool = pool.withColumn("idx", (F.row_number().over(w) - 1).cast("long"))
    sizes = pool.groupBy("pred").agg(
        F.count("*").cast("long").alias("n_pool")
    )
    exp = (
        t.join(sizes, "pred")
        .select(
            "subj", "pred", "obj",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
            "n_pool",
        )
        .withColumn(
            "idx",
            F.expr(h60_expr(_choice_key("spark", seed), "spark"))
            % F.col("n_pool"),
        )
    )
    neg = (
        exp.join(pool, ["pred", "idx"])
        .filter(F.col("cand") != F.col("obj"))
        .select(
            "subj", "pred", "obj", F.col("j").cast("long").alias("j"),
            F.col("cand").alias("neg_obj"),
        )
    )
    true_t = t.select("subj", "pred", F.col("obj").alias("neg_obj"))
    return neg.join(true_t, ["subj", "pred", "neg_obj"], "left_anti").select(
        "subj", "pred", "obj", "j", "neg_obj"
    )


def negative_samples_oracle_sql(
    triples_sql: str, k: int = 2, seed: str = "n0"
) -> str:
    """DuckDB mirror: same pool indexing, same md5 choice, same filters."""
    h = h60_expr(_choice_key("duckdb", seed), "duckdb")
    return f"""
    WITH t AS MATERIALIZED (
      SELECT DISTINCT subj, pred, obj FROM ({triples_sql})),
    pool AS MATERIALIZED (
      SELECT pred, cand,
             CAST(row_number() OVER (
               PARTITION BY pred ORDER BY cand ASC) - 1 AS BIGINT) AS idx
      FROM (SELECT DISTINCT pred, obj AS cand FROM t)),
    sizes AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_pool
              FROM pool GROUP BY pred),
    exp AS (
      SELECT t.subj, t.pred, t.obj, CAST(js.j AS BIGINT) AS j,
             ({h}) % s.n_pool AS idx
      FROM t JOIN sizes s USING (pred)
      CROSS JOIN (SELECT unnest(range(0, {k})) AS j) js),
    neg AS (
      SELECT e.subj, e.pred, e.obj, e.j, p.cand AS neg_obj
      FROM exp e JOIN pool p ON e.pred = p.pred AND e.idx = p.idx
      WHERE p.cand <> e.obj)
    SELECT n.subj, n.pred, n.obj, n.j, n.neg_obj
    FROM neg n
    WHERE NOT EXISTS (
      SELECT 1 FROM t WHERE t.subj = n.subj AND t.pred = n.pred
        AND t.obj = n.neg_obj)
    """
