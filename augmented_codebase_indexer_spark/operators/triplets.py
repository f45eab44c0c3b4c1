"""Retrieval training triplets from anchor text — (query, positive,
negative) tuples for contrastive retriever training, the web-native
free supervision: an anchor phrase IS a human-written query for the
page it links to (the "anchor text as query" line — TREC web tracks;
Craswell et al. SIGIR'01 showed anchor text beats content for site
finding; DPR/GTR-style dual encoders train on exactly this shape).

Positives are the linked targets; negatives are drawn from the
CORPUS-WIDE target pool by the repo's deterministic hash choice
(`functions/sqlhash.py::h60_expr` over (query, positive, seed, j) —
no RNG state, bit-identical at any parallelism, restartable; the
`operators/negatives.py` discipline).  The filtered protocol applies:
a drawn negative that the SAME query actually links to anywhere is a
false negative and is dropped post-draw (oversample with k slots).

Exactness: pool indexing is a row_number over the ordered distinct
target set; the draw is ``h60 % n_pool``; every gated column is
string/BIGINT.

Scale shape at 10^10 anchors: (query, positive) pairs collapse to
DISTINCT map-side; the pool is target-vocabulary-sized with ONE
unpartitioned-window indexing pass over targets only (vocabulary-
bounded — the documented negatives.py trade); the draw join is
idx-keyed against the slim pool; the false-negative filter is one
left-anti join on the (query, target) key.

Reference anchor: the reference's evaluation harness builds
(query, expected-result) pairs for recall@K (`src/aci/services/
evaluation_service.py`) — these triplets are that supervision turned
into training data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from augmented_codebase_indexer_spark.functions.sqlhash import h60_expr


def _choice_key(dialect: str, seed: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return (
        f"concat(query, '#', pos, '#', '{seed}', '#', CAST(j AS {s}))"
    )


def retrieval_triplets(
    anchors: DataFrame,
    k: int = 1,
    seed: str = "t0",
    query_col: str = "anchor",
    target_col: str = "target",
) -> DataFrame:
    """→ (query, pos, j, neg): up to ``k`` hash-drawn negatives per
    DISTINCT (normalized anchor phrase, linked target) pair; draws that
    hit the positive or any other target the query links to are
    dropped (filtered protocol)."""
    if k < 1:
        raise ValueError("retrieval_triplets: k must be >= 1")
    pairs = (
        anchors.select(
            F.trim(F.lower(F.col(query_col))).alias("query"),
            F.col(target_col).alias("pos"),
        )
        .filter(F.col("query") != "")
        .distinct()
    )
    pool = pairs.select(F.col("pos").alias("cand")).distinct()
    w = Window.orderBy(F.asc("cand"))
    pool = pool.withColumn("idx", (F.row_number().over(w) - 1).cast("long"))
    n_pool = pool.agg(F.count("*").cast("long").alias("n_pool"))
    exp = (
        pairs.crossJoin(F.broadcast(n_pool))
        .select(
            "query", "pos",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
            "n_pool",
        )
        .withColumn(
            "idx",
            F.expr(h60_expr(_choice_key("spark", seed), "spark"))
            % F.col("n_pool"),
        )
    )
    drawn = (
        exp.join(pool, "idx")
        .filter(F.col("cand") != F.col("pos"))
        .select("query", "pos", F.col("j").cast("long").alias("j"),
                F.col("cand").alias("neg"))
    )
    linked = pairs.select("query", F.col("pos").alias("neg"))
    return drawn.join(linked, ["query", "neg"], "left_anti").select(
        "query", "pos", "j", "neg"
    )


def retrieval_triplets_oracle_sql(
    anchors_sql: str, k: int = 1, seed: str = "t0"
) -> str:
    """DuckDB mirror: same normalization, pool indexing, md5 draw and
    filtered protocol."""
    h = h60_expr(_choice_key("duckdb", seed), "duckdb")
    return f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT trim(lower(anchor)) AS query, target AS pos
      FROM ({anchors_sql})
      WHERE trim(lower(anchor)) <> ''),
    pool AS MATERIALIZED (
      SELECT cand,
             CAST(row_number() OVER (ORDER BY cand ASC) - 1 AS BIGINT)
               AS idx
      FROM (SELECT DISTINCT pos AS cand FROM pairs)),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_pool FROM pool),
    exp AS (
      SELECT p.query, p.pos, CAST(js.j AS BIGINT) AS j,
             ({h}) % n.n_pool AS idx
      FROM pairs p CROSS JOIN n
      CROSS JOIN (SELECT unnest(range(0, {k})) AS j) js),
    drawn AS (
      SELECT e.query, e.pos, e.j, pl.cand AS neg
      FROM exp e JOIN pool pl ON pl.idx = e.idx
      WHERE pl.cand <> e.pos)
    SELECT d.query, d.pos, d.j, d.neg
    FROM drawn d
    WHERE NOT EXISTS (
      SELECT 1 FROM pairs p2
      WHERE p2.query = d.query AND p2.pos = d.neg)
    """
