"""Explicit hot-key skew handling (north_rule: "salted keys for hot-entity
skew").

Where it matters and where it doesn't:

* algebraic aggregates (count/sum/min/max) — Catalyst's partial (map-side)
  aggregation ALREADY two-phases them; a hot key combines before the
  shuffle and salting adds nothing. Don't salt these.
* non-algebraic aggregates (collect_list/collect_set, exact percentile) and
  JOINS against a skewed key — one reducer/task receives the whole hot key.
  AQE's skew-join split helps sort-merge joins at runtime; explicit salting
  is the deterministic, planner-independent fix and the only option for
  grouped collects.

``salted_agg`` implements the classic two-phase pattern:
    key → (key, salt = pmod(xxhash64(stable_col), S)) → partial agg per
    (key, salt) → final re-agg per key
``salted_join`` explodes the small side S ways so a hot key's rows spread
over S tasks.

The synthetic corpus plants a hot entity appearing in ~15% of relation
sentences (generator ``_zipf_pick``) precisely to exercise these paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, stable_col: str, buckets: int = 16, out: str = "__salt") -> DataFrame:
    """Deterministic salt from a high-cardinality column (never random —
    determinism invariant, SURVEY.md §7.4 #2)."""
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(stable_col)), F.lit(buckets)))


def salted_collect_set(
    df: DataFrame, key: str, value: str, stable_col: str, buckets: int = 16
) -> DataFrame:
    """groupBy(key).collect_set(value) that survives a hot key: partial
    collects per (key, salt), then flatten+dedup per key."""
    partial = (
        with_salt(df, stable_col, buckets)
        .groupBy(key, "__salt")
        .agg(F.collect_set(value).alias("__part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.array_distinct(F.flatten(F.collect_list("__part"))).alias(f"{value}_set"))
    )


def salted_count(df: DataFrame, key: str, stable_col: str, buckets: int = 16) -> DataFrame:
    """Two-phase count per key. Semantically identical to groupBy(key).count;
    exists to make the pattern explicit and testable (Catalyst's partial agg
    makes this specific case redundant — see module docstring)."""
    partial = (
        with_salt(df, stable_col, buckets)
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__n"))
    )
    return partial.groupBy(key).agg(F.sum("__n").alias("n"))


def salted_join(
    big: DataFrame, small: DataFrame, key: str, buckets: int = 16, how: str = "inner"
) -> DataFrame:
    """big ⋈ small on `key` with the big side's hot keys spread over
    `buckets` tasks: big gets a deterministic row-level salt, small is
    exploded ×buckets so every (key, salt) pair finds its match."""
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets))
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
