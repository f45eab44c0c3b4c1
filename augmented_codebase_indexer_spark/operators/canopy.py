"""Canopy blocking — ER candidate pairs via shared RARE tokens, the
content-based complement to positional (prefix/suffix) and spatial
(grid) blocking.

Canopy clustering (McCallum, Nigam & Ungar KDD'00): cheap overlapping
"canopies" first, expensive comparison only within a canopy. The
token-canopy form used by every large-scale dedup stack: two records
land in one canopy when they SHARE A TOKEN, but common tokens ('inc',
'the') put everything in one canopy — so tokens are document-frequency
gated, and only tokens with ``df ≤ max_df`` generate candidates. The
positional keys in `operators/nameblock.py` miss reordered names
('acme corp' vs 'corp acme' — both ends differ); a shared rare token
catches exactly that class, which is why production blocking unions
several key families and measures each with the same
pair-completeness fold (`nameblock.blocking_quality` composes
unchanged).

The df gate is also the Θ(df²) fan-out bound: candidate volume is
Σ_token df² over rare tokens only — the same count-gated discipline
as name-block caps, geo cells and wedge centers, with the drop
observable from the df frame.

Engine shape: lower+split+explode to (token, id), one df aggregate,
one token-keyed self-join, pair dedup. No UDF; names leave the scan
only as tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canopy_candidates(
    names: DataFrame, max_df: int = 50, min_token_len: int = 2
) -> DataFrame:
    """names(id, name) → (id_a, id_b, n_shared): pairs sharing ≥ 1
    rare token (df ≤ max_df, length ≥ min_token_len), id_a < id_b,
    n_shared = how many rare tokens they share."""
    toks = (
        names.select(
            "id",
            F.explode(F.split(F.lower(F.col("name")), " ")).alias("tok"),
        )
        .filter(F.length("tok") >= min_token_len)
        .distinct()
    )
    rare = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("long").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("tok")
    )
    keyed = toks.join(rare, "tok")
    a = keyed.select("tok", F.col("id").alias("id_a"))
    b = keyed.select("tok", F.col("id").alias("id_b"))
    return (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


def canopy_candidates_oracle_sql(
    names_sql: str, max_df: int = 50, min_token_len: int = 2
) -> str:
    """DuckDB mirror of :func:`canopy_candidates`."""
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT DISTINCT id, tok FROM (
        SELECT id, unnest(string_split(lower(name), ' ')) AS tok
        FROM ({names_sql}))
      WHERE length(tok) >= {min_token_len}),
    rare AS (SELECT tok FROM toks GROUP BY tok
             HAVING CAST(count(*) AS BIGINT) <= {max_df}),
    keyed AS MATERIALIZED (SELECT toks.* FROM toks JOIN rare USING (tok))
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM keyed a JOIN keyed b ON a.tok = b.tok AND a.id < b.id
    GROUP BY a.id, b.id
    """
