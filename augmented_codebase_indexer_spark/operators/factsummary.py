"""Entity fact summarization — the k most informative facts per
entity, by predicate-rarity ranking.

The entity-card problem (LinkSUM, Thalhammer et al. ESWC'16; RELIN
before it): an entity with 500 facts needs the 5 worth showing, and
frequency is the wrong order — `works_at` rows carry less identifying
information than the one `nobel_prize` row precisely because every
entity has the former. This is the rarity tier of those systems:
score a fact by its predicate's SUBJECT FREQUENCY (how many entities
carry this predicate at all) ascending — rare predicates first — with
(pred, obj) text as the deterministic tie-break, and keep the top k
per subject.

All-integer: pred_df is a count, the rank a row_number over a
deterministic total order; no float relevance model (the
embedding-similarity re-ranker in `plans/search.py` is the learned
upgrade when one is wanted).

Scale shape: one (pred, subj-distinct) aggregate to predicate-vocab
rows, broadcast back onto facts, one subject-partitioned top-k window
that Spark plans as WindowGroupLimit (rank pushdown — only k rows per
subject survive the exchange).

Reference anchor: the reference picks representative chunks per
symbol for its context packages (`services/context_service.py`); this
is the fact-grain form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def entity_fact_summary(facts: DataFrame, k: int = 3) -> DataFrame:
    """facts(subj, pred, obj) → (subj, pred, obj, pred_df, rank):
    the k most informative facts per subject (rank 1 = rarest
    predicate; ties on pred then obj text)."""
    f = facts.select("subj", "pred", "obj").distinct()
    df = f.groupBy("pred").agg(
        F.countDistinct("subj").cast("long").alias("pred_df"))
    w = Window.partitionBy("subj").orderBy("pred_df", "pred", "obj")
    return (
        f.join(df, "pred")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("subj", "pred", "obj", "pred_df", "rank")
    )


def entity_fact_summary_oracle_sql(facts_sql: str, k: int = 3) -> str:
    """DuckDB mirror of :func:`entity_fact_summary`."""
    return f"""
    WITH f AS MATERIALIZED (
      SELECT DISTINCT subj, pred, obj FROM ({facts_sql})),
    df AS (SELECT pred, CAST(count(DISTINCT subj) AS BIGINT) AS pred_df
           FROM f GROUP BY pred),
    ranked AS (
      SELECT f.subj, f.pred, f.obj, df.pred_df,
             CAST(row_number() OVER (PARTITION BY f.subj
               ORDER BY df.pred_df, f.pred, f.obj) AS BIGINT) AS rank
      FROM f JOIN df ON f.pred = df.pred)
    SELECT subj, pred, obj, pred_df, rank
    FROM ranked WHERE rank <= {k}
    """
