"""Mutual-best-match selection — the high-precision decision rule over
scored ER candidate pairs.

After blocking and verification produce scored candidates, the
decision tier must pick MATCHES. A plain threshold transitively
chains records through hub look-alikes; the classic precision fix is
reciprocal best match (the stable-roommates intuition; in ER practice
the 1:1 greedy tier of Fellegi-Sunter deployments, in bioinformatics
the reciprocal-best-hit orthology rule): record a's best-scoring
counterpart must also consider a ITS best. Ties are broken by
counterpart id text (deterministic argmin via the min-struct
discipline), so the decision — not just the scores — is
engine-exact.

Output keeps each surviving pair once (id_a < id_b) with the score;
records whose best match is not reciprocated produce nothing (they
stay unmatched rather than wrongly matched — the precision-first
contract).

Scale shape: candidates explode ×2 into directed views, one (record)
argmin aggregate (groupBy-min(struct), no window), one self-join of
the best-edge relation with itself on the reversed key. All id-keyed;
never touches the pair space beyond the candidates given.

Reference anchor: the reference links an alias to its single best
canonical above a margin (`core/linker`); this is the symmetric form
for record-record matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mutual_best_matches(
    cands: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    score_col: str = "dist",
    ascending: bool = True,
) -> DataFrame:
    """cands(id_a, id_b, score) → (id_a, id_b, score): pairs that are
    each other's best candidate. ``ascending=True`` treats the score
    as a distance (smaller is better); False as a similarity."""
    sgn = 1 if ascending else -1
    directed = cands.selectExpr(
        f"{a_col} AS src", f"{b_col} AS dst",
        f"CAST({score_col} AS BIGINT) AS sc",
    ).unionByName(cands.selectExpr(
        f"{b_col} AS src", f"{a_col} AS dst",
        f"CAST({score_col} AS BIGINT) AS sc",
    ))
    pick = F.struct((F.col("sc") * sgn).alias("s"),
                    F.col("dst").alias("d"))
    best = (
        directed.groupBy("src")
        .agg(F.min(pick).alias("b"))
        .select("src", F.col("b.d").alias("dst"),
                (F.col("b.s") * sgn).alias("sc"))
    )
    rev = best.select(F.col("src").alias("dst"),
                      F.col("dst").alias("src"))
    return (
        best.join(rev, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias(a_col), F.col("dst").alias(b_col),
                F.col("sc").alias(score_col))
    )


def mutual_best_matches_oracle_sql(
    cands_sql: str, ascending: bool = True
) -> str:
    """DuckDB mirror over (id_a, id_b, dist)."""
    order = "sc ASC, dst ASC" if ascending else "sc DESC, dst ASC"
    return f"""
    WITH directed AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst, CAST(dist AS BIGINT) AS sc
      FROM ({cands_sql})
      UNION ALL
      SELECT id_b, id_a, CAST(dist AS BIGINT) FROM ({cands_sql})),
    best AS MATERIALIZED (
      SELECT src, dst, sc FROM (
        SELECT *, row_number() OVER (PARTITION BY src
                  ORDER BY {order}) AS rn
        FROM directed)
      WHERE rn = 1)
    SELECT a.src AS id_a, a.dst AS id_b, a.sc AS dist
    FROM best a JOIN best b ON a.src = b.dst AND a.dst = b.src
    WHERE a.src < a.dst
    """
