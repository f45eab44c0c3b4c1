"""KG integrity / quality checks — the constraint pass a knowledge-graph
build runs before publishing a snapshot (SHACL-lite: cardinality
profiles, functional-predicate violations, referential integrity).
Reference analog: the reference validates its graph after build —
cycle detection and layer checks in ``topology_analyzer.py`` and the
unresolved-mention flagging in the linker; this module adds the
predicate-level contract checks standard in public KG practice (OWL
``FunctionalProperty``; SHACL cardinality shapes — both public specs).

Everything is counts over (subj, pred, obj) — groupBys on fixed-width
keys, map-side combined; every output column is BIGINT or string, so
the DuckDB oracles are exact by construction.

* :func:`predicate_profile` — one row per predicate: triple count,
  distinct subjects/objects, max out-degree (triples per subject), and
  ``functional_micro`` = (n_subj · 1e6) DIV n_triples — 1e6 means every
  subject has exactly one object (the predicate LOOKS functional;
  profile first, then declare constraints from evidence).
* :func:`functional_violations` — subjects holding >1 distinct object
  for a predicate DECLARED functional: the rows a nightly build alerts
  on (each is either a bad extraction or a bad declaration).
* :func:`dangling_edges` — referential integrity: edges whose endpoint
  is absent from the node table (anti-joins on node ids; at 10^12
  edges these are slim id-only exchanges, and the node side is a
  counted-broadcast candidate).

Scale shape: profile = ONE pred-keyed exchange after map-side partial
aggregation of (pred, subj) partials; violations = one (pred, subj)
exchange carrying counts only; dangling = two left-anti joins on node
ids. No text beyond ids crosses any exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def predicate_profile(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """(pred, n_triples, n_subj, n_obj, max_out, functional_micro) —
    distinct triples only (duplicate assertions are provenance, not
    structure)."""
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    ).distinct()
    per_subj = t.groupBy("p", "s").agg(F.count("*").cast("long").alias("c"))
    return (
        per_subj.groupBy("p")
        .agg(
            F.sum("c").cast("long").alias("n_triples"),
            F.count("*").cast("long").alias("n_subj"),
            F.max("c").cast("long").alias("max_out"),
        )
        .join(
            t.groupBy("p").agg(
                F.countDistinct("o").cast("long").alias("n_obj")
            ),
            "p",
        )
        .select(
            F.col("p").alias("pred"),
            "n_triples",
            "n_subj",
            "n_obj",
            "max_out",
            F.expr("(n_subj * 1000000) DIV n_triples").alias(
                "functional_micro"
            ),
        )
    )


def functional_violations(
    triples: DataFrame,
    functional_preds: tuple,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """(pred, subj, n_objects) for subjects with >1 distinct object on a
    declared-functional predicate."""
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    ).distinct()
    return (
        t.filter(F.col("p").isin(*functional_preds))
        .groupBy("p", "s")
        .agg(F.count("*").cast("long").alias("n_objects"))
        .filter(F.col("n_objects") > 1)
        .select(F.col("p").alias("pred"), F.col("s").alias("subj"),
                "n_objects")
    )


def dangling_edges(
    edges: DataFrame,
    nodes: DataFrame,
    subj: str = "subj",
    obj: str = "obj",
    node_id: str = "node_id",
) -> DataFrame:
    """Edges with an endpoint missing from ``nodes``: edge columns +
    ``missing`` ∈ {'subj', 'obj', 'both'}."""
    ids = nodes.select(F.col(node_id).alias("_nid")).distinct()
    e = (
        edges.join(
            ids.withColumnRenamed("_nid", subj).withColumn(
                "_has_s", F.lit(True)
            ),
            subj,
            "left",
        )
        .join(
            ids.withColumnRenamed("_nid", obj).withColumn(
                "_has_o", F.lit(True)
            ),
            obj,
            "left",
        )
    )
    return (
        e.filter(F.col("_has_s").isNull() | F.col("_has_o").isNull())
        .select(
            *edges.columns,
            F.when(F.col("_has_s").isNull() & F.col("_has_o").isNull(),
                   F.lit("both"))
            .when(F.col("_has_s").isNull(), F.lit("subj"))
            .otherwise(F.lit("obj"))
            .alias("missing"),
        )
    )


def domain_range_violations(
    triples: DataFrame,
    node_types: DataFrame,
    declarations: DataFrame,
) -> DataFrame:
    """SHACL-lite ``sh:class`` on both edge ends: rows of ``triples``
    whose subject type differs from the declared domain or whose object
    type differs from the declared range — (subj, pred, obj, subj_type,
    obj_type, violation ∈ {'domain','range','both'}).

    Closed-world on types: a node MISSING from ``node_types`` cannot be
    proven conformant, so it violates (reported as ``subj_type`` /
    ``obj_type`` = 'untyped') — the SHACL semantics for a class shape
    over an untyped focus node. Predicates absent from ``declarations``
    are unconstrained and never reported.

    Scale shape: inner join on ``pred`` against the (tiny, per-ontology)
    declarations — left to the planner, it auto-broadcasts; then two
    id-keyed left joins against node_types (slim (id, type) rows). No
    text, counts, or windows."""
    t = triples.select("subj", "pred", "obj").distinct()
    d = declarations.select("pred", "domain_type", "range_type")
    nt = node_types.select("node_id", "node_type")
    j = (
        t.join(d, "pred")
        .join(
            nt.select(F.col("node_id").alias("subj"),
                      F.col("node_type").alias("subj_type")),
            "subj", "left",
        )
        .join(
            nt.select(F.col("node_id").alias("obj"),
                      F.col("node_type").alias("obj_type")),
            "obj", "left",
        )
    )
    bad_s = F.col("subj_type").isNull() | (
        F.col("subj_type") != F.col("domain_type"))
    bad_o = F.col("obj_type").isNull() | (
        F.col("obj_type") != F.col("range_type"))
    return j.filter(bad_s | bad_o).select(
        "subj",
        "pred",
        "obj",
        F.coalesce("subj_type", F.lit("untyped")).alias("subj_type"),
        F.coalesce("obj_type", F.lit("untyped")).alias("obj_type"),
        F.when(bad_s & bad_o, F.lit("both"))
        .when(bad_s, F.lit("domain"))
        .otherwise(F.lit("range"))
        .alias("violation"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors
# ---------------------------------------------------------------------------

def predicate_profile_sql(triples_sql: str) -> str:
    return f"""
    WITH t AS (SELECT DISTINCT subj AS s, pred AS p, obj AS o
               FROM ({triples_sql})),
    per_subj AS (
      SELECT p, s, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY p, s),
    prof AS (
      SELECT p, CAST(sum(c) AS BIGINT) AS n_triples,
             CAST(count(*) AS BIGINT) AS n_subj,
             CAST(max(c) AS BIGINT) AS max_out
      FROM per_subj GROUP BY p),
    objs AS (
      SELECT p, CAST(count(DISTINCT o) AS BIGINT) AS n_obj FROM t GROUP BY p)
    SELECT prof.p AS pred, n_triples, n_subj, n_obj, max_out,
           CAST((n_subj * 1000000) // n_triples AS BIGINT)
             AS functional_micro
    FROM prof JOIN objs ON prof.p = objs.p
    """


def domain_range_violations_sql(
    triples_sql: str, node_types_sql: str, declarations_sql: str
) -> str:
    return f"""
    WITH t AS (SELECT DISTINCT subj, pred, obj FROM ({triples_sql})),
    nt AS (SELECT node_id, node_type FROM ({node_types_sql})),
    d AS (SELECT pred, domain_type, range_type FROM ({declarations_sql})),
    j AS (
      SELECT t.subj, t.pred, t.obj,
             s.node_type AS subj_type, o.node_type AS obj_type,
             d.domain_type, d.range_type
      FROM t JOIN d ON t.pred = d.pred
      LEFT JOIN nt s ON t.subj = s.node_id
      LEFT JOIN nt o ON t.obj = o.node_id)
    SELECT subj, pred, obj,
           COALESCE(subj_type, 'untyped') AS subj_type,
           COALESCE(obj_type, 'untyped') AS obj_type,
           CASE WHEN (subj_type IS NULL OR subj_type <> domain_type)
                 AND (obj_type IS NULL OR obj_type <> range_type)
                THEN 'both'
                WHEN (subj_type IS NULL OR subj_type <> domain_type)
                THEN 'domain'
                ELSE 'range' END AS violation
    FROM j
    WHERE (subj_type IS NULL OR subj_type <> domain_type)
       OR (obj_type IS NULL OR obj_type <> range_type)
    """


def functional_violations_sql(
    triples_sql: str, functional_preds: tuple
) -> str:
    preds = ", ".join(f"'{p}'" for p in functional_preds)
    return f"""
    WITH t AS (SELECT DISTINCT subj AS s, pred AS p, obj AS o
               FROM ({triples_sql}))
    SELECT p AS pred, s AS subj, CAST(count(*) AS BIGINT) AS n_objects
    FROM t WHERE p IN ({preds})
    GROUP BY p, s HAVING count(*) > 1
    """


def symmetry_violations(
    triples: DataFrame,
    symmetric_preds: tuple,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """(pred, subj, obj) facts on a declared-SYMMETRIC predicate whose
    mirror (obj, pred, subj) is absent — the OWL SymmetricProperty QA
    check (spouse/sibling/adjacent-style relations; a one-directional
    assertion is an extraction artifact, not a fact).  Self-loops
    trivially satisfy symmetry and never surface.

    Scale shape: distinct facts on the (small) symmetric-predicate
    family, then ONE left-anti self-equi-join on the reversed key —
    co-located under (pred, subj/obj) bucketing; nothing corpus-sized
    survives the predicate pushdown.
    """
    t = (
        triples.select(
            F.col(subj).alias("s"), F.col(pred).alias("p"),
            F.col(obj).alias("o"),
        )
        .filter(F.col("p").isin(*symmetric_preds))
        .filter(F.col("s") != F.col("o"))
        .distinct()
    )
    rev = t.select(
        F.col("o").alias("s"), F.col("p").alias("p"),
        F.col("s").alias("o"),
    )
    return t.join(rev, ["s", "p", "o"], "left_anti").select(
        F.col("p").alias("pred"), F.col("s").alias("subj"),
        F.col("o").alias("obj"),
    )


def symmetry_violations_sql(triples_sql: str, symmetric_preds: tuple) -> str:
    """DuckDB mirror: same distinct grain, same reversed anti-join."""
    preds = ", ".join(f"'{p}'" for p in symmetric_preds)
    return f"""
    WITH t AS MATERIALIZED (
      SELECT DISTINCT subj AS s, pred AS p, obj AS o FROM ({triples_sql})
      WHERE pred IN ({preds}) AND subj <> obj)
    SELECT t.p AS pred, t.s AS subj, t.o AS obj
    FROM t ANTI JOIN t r ON r.s = t.o AND r.p = t.p AND r.o = t.s
    """
