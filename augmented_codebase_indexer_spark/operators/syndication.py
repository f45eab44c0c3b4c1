"""Syndication-source attribution — who published first inside each
near-duplicate cluster: the origin/reprint labeling every news-heavy
corpus needs (keep the wire-service original, drop or down-weight the
800 reprints; credit facts to the source, not the mirror).  First-seen
attribution over duplicate clusters is the standard operational
definition (the newspaper-syndication analyses of Smith et al. JCDL'15
"Computational methods for uncovering reprinted texts" use exactly
first-publication attribution over aligned reuse clusters).

Composition: duplicate PAIRS come from any dedup tier (minhash, n-gram
Jaccard, containment — `operators/dedup.py`); this operator closes
them into clusters with the existing min-label connected components
(`operators/components.py::connected_components`) and elects the
member with the earliest ``(fetched_epoch, doc_id)`` as the origin —
the doc id breaks same-second ties deterministically.

Exactness: epochs and ids are BIGINT; the election is a min(struct)
argmax per component; ``lag_sec`` is a plain difference.  Singleton
docs (no duplicate edge) are absent — they are their own origin and
carry no attribution information.

Scale shape: the pair relation is already sparse (the dedup tiers
guarantee no all-pairs shape); CC runs over it with the fixed-round
localCheckpoint discipline; the election is one component-keyed
min(struct) + one join back — component-cardinality-sized state.

Reference anchor: the reference keeps one canonical node per duplicate
symbol group (`src/aci/core/graph_store.py` upsert-dedup) — this adds
the TEMPORAL "who was first" dimension the web needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.components import (
    connected_components,
)


def syndication_origins(
    pairs: DataFrame,
    fetches: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    doc_col: str = "doc_id",
    epoch_col: str = "fetched_epoch",
    max_iters: int = 25,
) -> DataFrame:
    """→ (doc_id, component, origin, origin_epoch, fetched_epoch,
    lag_sec, is_origin): every clustered doc with its cluster's elected
    origin.  Docs appearing in ``pairs`` but missing from ``fetches``
    drop with their cluster-mates keeping the election honest (the
    inner join removes only the undated doc, not the cluster)."""
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select("dst"))
        .distinct()
    )
    cc = connected_components(nodes, e, max_iters=max_iters)
    dated = cc.join(
        fetches.select(
            F.col(doc_col).alias("id"),
            F.col(epoch_col).cast("long").alias("fetched_epoch"),
        ),
        "id",
    )
    origins = (
        dated.groupBy("component")
        .agg(F.min(F.struct(
            F.col("fetched_epoch").alias("e"),
            F.col("id").alias("d"),
        )).alias("w"))
        .selectExpr("component", "w.d AS origin", "w.e AS origin_epoch")
    )
    return dated.join(origins, "component").selectExpr(
        "id AS doc_id", "component", "origin", "origin_epoch",
        "fetched_epoch",
        "fetched_epoch - origin_epoch AS lag_sec",
        "id = origin AS is_origin",
    )


def syndication_origins_sql(pairs_sql: str, fetches_sql: str) -> str:
    """DuckDB mirror: min-label CC as a recursive CTE (the
    component_sizes oracle precedent), then the same election."""
    return f"""
    WITH RECURSIVE e0 AS (SELECT a AS src, b AS dst FROM ({pairs_sql})),
    e AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
    cc AS (
      SELECT src AS id, src AS label FROM e
      UNION
      SELECT e.dst AS id, c.label FROM cc c JOIN e ON e.src = c.id),
    lbl AS MATERIALIZED (
      SELECT id AS node, min(label) AS component FROM cc GROUP BY id),
    dated AS MATERIALIZED (
      SELECT l.node AS doc_id, l.component,
             CAST(f.fetched_epoch AS BIGINT) AS fetched_epoch
      FROM lbl l JOIN ({fetches_sql}) f ON f.doc_id = l.node),
    origins AS (
      SELECT component, w[2] AS origin, w[1] AS origin_epoch
      FROM (SELECT component, min(ROW(fetched_epoch, doc_id)) AS w
            FROM dated GROUP BY component))
    SELECT d.doc_id, d.component, o.origin, o.origin_epoch,
           d.fetched_epoch,
           d.fetched_epoch - o.origin_epoch AS lag_sec,
           d.doc_id = o.origin AS is_origin
    FROM dated d JOIN origins o ON o.component = d.component
    """
