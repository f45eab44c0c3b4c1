"""Horn-rule mining over the KG — the AMIE same-pair core (Galárraga,
Teflioudi, Hose & Suchanek WWW'13 "AMIE: association rule mining under
incomplete evidence"): for every ordered predicate pair, the rule
``q(x,y) ⇒ p(x,y)`` with its support and TWO confidence denominators —
standard confidence (support / |q|, which punishes rules whose heads
the KG simply hasn't extracted yet) and AMIE's PCA confidence
(support / |q-pairs whose subject has SOME p fact|: under the Partial
Completeness Assumption, a subject with any p facts is assumed
complete for p, so only those q-pairs count as counterevidence).
Mined rules drive KG completion ("works_at ⇒ employer"), extractor
redundancy detection, and error screens (`operators/predalign.py`
holds the unordered-synonym form; rules are DIRECTED implications).

Exactness: set semantics over distinct (s, p, o) facts; support,
|q| and the PCA denominator are BIGINT counts; the two confidences
are one truncating division each.  Rules below ``min_support`` drop
(the AMIE pruning).

Scale shape at 10^10 facts: support comes from ONE (subject, object)-
keyed self-equi-join of the distinct fact table (co-located under
subject bucketing — the predalign plan) producing predicate-vocab²
rows after map-side combine; the PCA denominator is one subject-keyed
join of q-facts against the distinct (subject, predicate) existence
relation, same grouping; predicate sizes ride a broadcast.  Nothing
predicate-pair-scale ever carries entity strings past its groupBy.

Reference anchor: the reference derives relationship edges from
observed co-occurrence patterns when building its graph
(`src/aci/services/graph_builder.py`) — rule mining is the inductive
generalization of that step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def mine_pair_rules(
    triples: DataFrame,
    min_support: int = 2,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """→ (body_pred, head_pred, n_support, n_body, n_pca, conf_micro,
    pca_micro): every ordered rule body(x,y) ⇒ head(x,y) with support
    ≥ ``min_support``."""
    if min_support < 1:
        raise ValueError("mine_pair_rules: min_support must be >= 1")
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    ).distinct()
    support = (
        t.alias("x")
        .join(t.alias("y"), ["s", "o"])
        .filter(F.col("x.p") != F.col("y.p"))
        .groupBy(F.col("x.p").alias("body_pred"),
                 F.col("y.p").alias("head_pred"))
        .agg(F.count("*").cast("long").alias("n_support"))
        .filter(F.col("n_support") >= min_support)
    )
    sizes = t.groupBy(F.col("p").alias("body_pred")).agg(
        F.count("*").cast("long").alias("n_body")
    )
    has_p = t.select(F.col("s").alias("s"),
                     F.col("p").alias("head_pred")).distinct()
    pca = (
        t.selectExpr("s", "p AS body_pred")
        .join(has_p, "s")
        .filter(F.col("body_pred") != F.col("head_pred"))
        .groupBy("body_pred", "head_pred")
        .agg(F.count("*").cast("long").alias("n_pca"))
    )
    return (
        support.join(F.broadcast(sizes), "body_pred")
        .join(pca, ["body_pred", "head_pred"])
        .selectExpr(
            "body_pred", "head_pred", "n_support", "n_body", "n_pca",
            f"n_support * {MICRO} DIV n_body AS conf_micro",
            f"n_support * {MICRO} DIV n_pca AS pca_micro",
        )
    )


def mine_pair_rules_oracle_sql(
    triples_sql: str, min_support: int = 2
) -> str:
    """DuckDB mirror: same set semantics, same joins, same divisions."""
    return f"""
    WITH t AS MATERIALIZED (
      SELECT DISTINCT subj AS s, pred AS p, obj AS o
      FROM ({triples_sql})),
    support AS (
      SELECT x.p AS body_pred, y.p AS head_pred,
             CAST(count(*) AS BIGINT) AS n_support
      FROM t x JOIN t y ON y.s = x.s AND y.o = x.o AND y.p <> x.p
      GROUP BY x.p, y.p
      HAVING count(*) >= {min_support}),
    sizes AS (
      SELECT p AS body_pred, CAST(count(*) AS BIGINT) AS n_body
      FROM t GROUP BY p),
    has_p AS (SELECT DISTINCT s, p AS head_pred FROM t),
    pca AS (
      SELECT b.p AS body_pred, h.head_pred,
             CAST(count(*) AS BIGINT) AS n_pca
      FROM t b JOIN has_p h ON h.s = b.s AND h.head_pred <> b.p
      GROUP BY b.p, h.head_pred)
    SELECT s1.body_pred, s1.head_pred, s1.n_support, sz.n_body,
           pca.n_pca,
           s1.n_support * {MICRO} // sz.n_body AS conf_micro,
           s1.n_support * {MICRO} // pca.n_pca AS pca_micro
    FROM support s1
    JOIN sizes sz ON sz.body_pred = s1.body_pred
    JOIN pca ON pca.body_pred = s1.body_pred
            AND pca.head_pred = s1.head_pred
    """


def mine_pair_rules_py(
    triples: list[tuple[str, str, str]], min_support: int = 2
) -> list[tuple]:
    """Pure-python mirror for tests."""
    t = set(triples)
    preds = sorted({p for _, p, _ in t})
    by_pair: dict[tuple[str, str], set[str]] = {}
    by_pred: dict[str, set[tuple[str, str]]] = {p: set() for p in preds}
    subj_has: dict[str, set[str]] = {}
    for s, p, o in t:
        by_pair.setdefault((s, o), set()).add(p)
        by_pred[p].add((s, o))
        subj_has.setdefault(s, set()).add(p)
    out = []
    for q in preds:
        for p in preds:
            if p == q:
                continue
            sup = sum(
                1 for (s, o) in by_pred[q] if p in by_pair[(s, o)]
            )
            if sup < min_support:
                continue
            pca = sum(1 for (s, _) in by_pred[q] if p in subj_has[s])
            out.append((
                q, p, sup, len(by_pred[q]), pca,
                sup * MICRO // len(by_pred[q]), sup * MICRO // pca,
            ))
    return sorted(out)
