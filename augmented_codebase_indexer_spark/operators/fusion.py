"""Truth fusion — multi-source conflict resolution for KG construction.

Web-scale triple extraction asserts the same (subj, pred) from many
pages/domains with CONFLICTING objects (typos, stale mirrors, spam).
The publish step must pick one value per fact and estimate how much
each source can be trusted — the "knowledge fusion" stage of public KG
builds (Dong et al., *Knowledge Vault*, KDD'14 §5; Yin et al.,
*TruthFinder*, KDD'07; Pasternack & Roth, COLING'10 "investment"
family). The reference has no multi-source stage (one repo = one
source of truth); its closest analog is last-write-wins upserts
(`src/aci/services/sqlite.py` INSERT OR REPLACE), which this operator
generalizes to weighted voting.

Algorithm (fixed ``iters`` rounds, deterministic, ALL-INTEGER so the
DuckDB oracle is exact by construction — see
tests/test_lmquality.py's tie-class discipline):

* round 0: every source has trust 1_000_000 micro-units.
* vote: per claim (subj, pred, obj), ``support_micro`` = BIGINT sum of
  supporting sources' trust; the winner per (subj, pred) maximizes
  (support_micro, obj DESC→ASC) — i.e. ties break to the
  lexicographically smallest obj.
* re-trust: ``trust_micro(src) = (n_correct · 1e6) DIV n_claims`` —
  the integer share of the source's distinct claims that agree with
  the current winners (Pasternack-Roth "voting" update, quantized).
* after ``iters`` re-trust rounds, a final vote yields the published
  winners.

Scale shape (10^12 assertions): one distinct over (src, subj, pred,
obj); per round ONE (subj, pred, obj)-keyed exchange of id+count rows
for the vote (map-side combined), one argmax as a groupBy min(struct)
— no window over an unbounded partition — and one src-keyed exchange
of counts for re-trust. The trust table (one row per source ≈ one per
registrable domain) rides a counted ``guarded_broadcast``; above the
cap it degrades to a shuffled join. No text, no floats, no driver
loops — ``iters`` is a compile-time constant, so the lineage depth is
bounded and each round's trust frame is pinned + counted (the
broadcast guard's action), which also keeps the plan from re-deriving
earlier rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .guards import guarded_broadcast, register_pin

_MICRO = 1_000_000


def _claims(assertions: DataFrame) -> DataFrame:
    """Distinct (src, subj, pred, obj) — a source asserts a claim once;
    repeated extraction of the same claim from one source is provenance
    volume, not extra evidence (Knowledge Vault §5 dedupes the same
    way)."""
    return assertions.select("src", "subj", "pred", "obj").distinct()


def _vote(a: DataFrame, trust: DataFrame) -> DataFrame:
    """Per-claim support under ``trust``: one (subj,pred,obj) exchange,
    partials combined map-side."""
    return (
        a.join(guarded_broadcast(trust), "src")
        .groupBy("subj", "pred", "obj")
        .agg(
            F.sum("trust_micro").cast("long").alias("support_micro"),
            F.count("*").cast("long").alias("n_src"),
        )
    )


def _winners(votes: DataFrame) -> DataFrame:
    """argmax per (subj, pred): max support, ties to the smallest obj —
    expressed as min(struct(-support, obj, n_src)) so it plans as a
    partial-aggregated groupBy, not a window over the fact key."""
    pick = votes.groupBy("subj", "pred").agg(
        F.min(
            F.struct(
                (-F.col("support_micro")).alias("neg"),
                F.col("obj").alias("obj"),
                F.col("n_src").alias("n_src"),
            )
        ).alias("w")
    )
    return pick.select(
        "subj",
        "pred",
        F.col("w.obj").alias("obj"),
        (-F.col("w.neg")).alias("support_micro"),
        F.col("w.n_src").alias("n_src"),
    )


def _retrust(a: DataFrame, winners: DataFrame) -> DataFrame:
    """(src, n_claims, n_correct, trust_micro) under ``winners``.
    ``winners`` is slim (subj, pred, obj) ids; the inner join is a semi
    join in effect (both sides unique on the key)."""
    totals = a.groupBy("src").agg(F.count("*").cast("long").alias("n_claims"))
    correct = (
        a.join(winners.select("subj", "pred", "obj"), ["subj", "pred", "obj"])
        .groupBy("src")
        .agg(F.count("*").cast("long").alias("n_correct"))
    )
    return totals.join(correct, "src", "left").select(
        "src",
        "n_claims",
        F.coalesce("n_correct", F.lit(0)).cast("long").alias("n_correct"),
        F.expr(
            f"(coalesce(n_correct, 0) * {_MICRO}) DIV n_claims"
        ).alias("trust_micro"),
    )


def _fuse(assertions: DataFrame, iters: int) -> tuple[DataFrame, DataFrame]:
    if iters < 1:
        raise ValueError("truth fusion needs iters >= 1 (round 0 is the "
                         "uniform-trust vote; re-trust defines the output)")
    a = register_pin(_claims(assertions).persist())
    trust = a.select("src").distinct().select(
        "src",
        F.lit(None).cast("long").alias("n_claims"),
        F.lit(None).cast("long").alias("n_correct"),
        F.lit(_MICRO).cast("long").alias("trust_micro"),
    )
    for _ in range(iters):
        w = _winners(_vote(a, trust.select("src", "trust_micro")))
        trust = _retrust(a, w)
    winners = _winners(_vote(a, trust.select("src", "trust_micro")))
    return winners, trust


def truth_fusion(assertions: DataFrame, iters: int = 2) -> DataFrame:
    """Published facts after ``iters`` trust rounds:
    (subj, pred, obj, support_micro, n_src)."""
    winners, _ = _fuse(assertions, iters)
    return winners


def source_trust(assertions: DataFrame, iters: int = 2) -> DataFrame:
    """Final per-source reliability: (src, n_claims, n_correct,
    trust_micro)."""
    _, trust = _fuse(assertions, iters)
    return trust


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors (unrolled fixed-iteration CTE chain; row_number
# argmax — an independent formulation of the same integer recurrence)
# ---------------------------------------------------------------------------


def _fusion_ctes(assertions_sql: str, iters: int) -> tuple[list[str], str]:
    parts = [
        f"a AS (SELECT DISTINCT src, subj, pred, obj FROM ({assertions_sql}))",
        f"t0 AS (SELECT src, CAST({_MICRO} AS BIGINT) AS trust_micro "
        "FROM (SELECT DISTINCT src FROM a))",
    ]
    prev = "t0"
    for i in range(1, iters + 1):
        parts.append(
            f"v{i} AS (SELECT a.subj, a.pred, a.obj, "
            "CAST(sum(trust_micro) AS BIGINT) AS support_micro "
            f"FROM a JOIN {prev} USING (src) GROUP BY a.subj, a.pred, a.obj)"
        )
        parts.append(
            f"w{i} AS (SELECT subj, pred, obj FROM ("
            "SELECT subj, pred, obj, row_number() OVER ("
            "PARTITION BY subj, pred ORDER BY support_micro DESC, obj ASC"
            f") AS rn FROM v{i}) WHERE rn = 1)"
        )
        parts.append(
            f"t{i} AS (SELECT n.src, n.n_claims, "
            "CAST(COALESCE(c.n_correct, 0) AS BIGINT) AS n_correct, "
            f"CAST((COALESCE(c.n_correct, 0) * {_MICRO}) // n.n_claims "
            "AS BIGINT) AS trust_micro "
            "FROM (SELECT src, CAST(count(*) AS BIGINT) AS n_claims "
            "FROM a GROUP BY src) n "
            "LEFT JOIN (SELECT a.src, CAST(count(*) AS BIGINT) AS n_correct "
            f"FROM a JOIN w{i} USING (subj, pred, obj) GROUP BY a.src) c "
            "ON n.src = c.src)"
        )
        prev = f"t{i}"
    parts.append(
        "vf AS (SELECT a.subj, a.pred, a.obj, "
        "CAST(sum(trust_micro) AS BIGINT) AS support_micro, "
        "CAST(count(*) AS BIGINT) AS n_src "
        f"FROM a JOIN {prev} USING (src) GROUP BY a.subj, a.pred, a.obj)"
    )
    parts.append(
        "wf AS (SELECT subj, pred, obj, support_micro, n_src FROM ("
        "SELECT subj, pred, obj, support_micro, n_src, row_number() OVER ("
        "PARTITION BY subj, pred ORDER BY support_micro DESC, obj ASC"
        ") AS rn FROM vf) WHERE rn = 1)"
    )
    return parts, prev


def truth_fusion_oracle_sql(assertions_sql: str, iters: int = 2) -> str:
    parts, _ = _fusion_ctes(assertions_sql, iters)
    return ("WITH " + ",\n".join(parts)
            + "\nSELECT subj, pred, obj, support_micro, n_src FROM wf")


def source_trust_oracle_sql(assertions_sql: str, iters: int = 2) -> str:
    parts, prev = _fusion_ctes(assertions_sql, iters)
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT src, n_claims, n_correct, trust_micro FROM {prev}")
