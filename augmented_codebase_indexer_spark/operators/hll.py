"""HyperLogLog registers as relational algebra — exact-gateable sketch.

Counting distinct urls/tokens/entities at 10^12 scale is THE case for
sketches: a HyperLogLog register table (Flajolet et al., AofA'07) is
64 rows, mergeable by ``max`` per bucket — an ALGEBRAIC aggregate, so
Spark's map-side combine reduces each partition to ≤m rows before the
exchange, and unioning two corpora's sketches is a trivial groupBy-max
(the property exact `COUNT(DISTINCT)` fundamentally lacks). The
reference counts distincts by full scroll (`qdrant.py:513-540`); at
web scale you keep the sketch instead.

Determinism/oracle discipline: Spark's own ``approx_count_distinct``
is HLL++ with engine-private internals — un-oracle-able. This module
builds the registers from ``md5`` hex (identical text in both engines)
with ONE shared SQL expression (bucket = first-byte % m; rho = leading
zero BITS of the next 64-bit region + 1, derived from hex chars via
TRIM(LEADING '0') + a 16-way CASE — pure standard SQL both engines
evaluate identically). The GATED output is the integer register table
(bucket, max_rho); the float estimate is a display-path helper
(:func:`hll_estimate`) computed FROM the registers, never hashed.

m is fixed at 64 (p=6): relative error ≈ 1.04/√64 ≈ 13% — the sketch
is a demo of the mergeable-aggregate shape; production tunes p.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 64  # registers (p = 6)

_HEXVAL = (
    "CASE {c} WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 3 "
    "WHEN '4' THEN 4 WHEN '5' THEN 5 WHEN '6' THEN 6 WHEN '7' THEN 7 "
    "WHEN '8' THEN 8 WHEN '9' THEN 9 WHEN 'a' THEN 10 WHEN 'b' THEN 11 "
    "WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14 ELSE 15 END"
)


def hll_register_sql(val_expr: str) -> tuple[str, str]:
    """(bucket_expr, rho_expr) — standard SQL evaluated IDENTICALLY by
    Spark and DuckDB over ``md5(val_expr)``'s hex string."""
    h = f"md5({val_expr})"
    c1 = _HEXVAL.format(c=f"substr({h}, 1, 1)")
    c2 = _HEXVAL.format(c=f"substr({h}, 2, 1)")
    bucket = f"((({c1}) * 16 + ({c2})) % {M})"
    region = f"substr({h}, 3, 16)"
    stripped = f"TRIM(LEADING '0' FROM {region})"
    lead_chars = f"(16 - length({stripped}))"
    first = f"substr({stripped}, 1, 1)"
    extra = (
        f"CASE WHEN {first} = '1' THEN 3 "
        f"WHEN {first} IN ('2', '3') THEN 2 "
        f"WHEN {first} IN ('4', '5', '6', '7') THEN 1 ELSE 0 END"
    )
    # all-zero region: stripped = '' → lead_chars 16, extra hits the
    # ELSE 0 branch → rho = 65 (the saturated register, standard HLL)
    rho = f"(CASE WHEN {stripped} = '' THEN 65 ELSE {lead_chars} * 4 + {extra} + 1 END)"
    return bucket, rho


def hll_registers(
    df: DataFrame, value_col: str = "value"
) -> DataFrame:
    """df → (bucket, max_rho): the m-row register table, BIGINT."""
    bucket, rho = hll_register_sql(value_col)
    return (
        df.select(
            F.expr(bucket).cast("long").alias("bucket"),
            F.expr(rho).cast("long").alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_registers_oracle_sql(values_sql: str, value_expr: str = "value") -> str:
    """DuckDB mirror — the SAME expressions over the same relation."""
    bucket, rho = hll_register_sql(value_expr)
    return f"""
    WITH v AS ({values_sql}),
    regs AS (SELECT CAST({bucket} AS BIGINT) AS bucket,
                    CAST({rho} AS BIGINT) AS rho FROM v)
    SELECT bucket, max(rho) AS max_rho FROM regs GROUP BY bucket
    """


def hll_estimate(registers: dict[int, int]) -> float:
    """Display-path estimator from a {bucket: max_rho} table (never
    gated): standard HLL with the small-range linear-counting
    correction."""
    import math

    alpha = 0.709  # alpha_64
    zeros = M - len(registers)
    s = zeros * 1.0 + sum(2.0 ** -r for r in registers.values())
    raw = alpha * M * M / s
    if raw <= 2.5 * M and zeros:
        return M * math.log(M / zeros)
    return raw


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05): the frequency
# sibling of the HLL registers — d independent hash rows × w buckets of
# occurrence COUNTS. Counts are a SUM-mergeable algebraic aggregate (two
# corpora's sketches add cell-wise), point estimates are min over rows
# and one-sided (est ≥ true). Same discipline as HLL: the register table
# is the exact integer gate; estimates are display-path.
# --------------------------------------------------------------------------

CM_D = 4   # hash rows
CM_W = 64  # buckets per row


def cm_bucket_sql(val_expr: str, row_expr: str) -> str:
    """Bucket for hash row ``row_expr``: first byte of
    md5(val || '#' || row) mod CM_W — standard SQL, both engines."""
    h = f"md5(CAST({val_expr} AS STRING) || '#' || CAST({row_expr} AS STRING))"  # STRING: valid in both engines
    c1 = _HEXVAL.format(c=f"substr({h}, 1, 1)")
    c2 = _HEXVAL.format(c=f"substr({h}, 2, 1)")
    return f"((({c1}) * 16 + ({c2})) % {CM_W})"


def cm_registers(df: DataFrame, value_col: str = "value") -> DataFrame:
    """df → (row_idx, bucket, cnt): the d×w Count-Min table, BIGINT."""
    rows = df.select(
        F.col(value_col).alias("value"),
        F.explode(F.sequence(F.lit(0), F.lit(CM_D - 1))).alias("row_idx"),
    )
    bucket = cm_bucket_sql("value", "row_idx")
    return (
        rows.select(
            F.col("row_idx").cast("long").alias("row_idx"),
            F.expr(bucket).cast("long").alias("bucket"),
        )
        .groupBy("row_idx", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_registers_oracle_sql(values_sql: str, value_expr: str = "value") -> str:
    """DuckDB mirror — same bucket expressions, lateral row explode."""
    bucket = cm_bucket_sql(value_expr, "r.row_idx")
    return f"""
    WITH v AS ({values_sql}),
    rows_ AS (
      SELECT {value_expr} AS value, r.row_idx
      FROM v, LATERAL (
        SELECT unnest(generate_series(0, {CM_D - 1})) AS row_idx) r),
    regs AS (
      SELECT CAST(row_idx AS BIGINT) AS row_idx,
             CAST({cm_bucket_sql("value", "row_idx")} AS BIGINT) AS bucket
      FROM rows_)
    SELECT row_idx, bucket, CAST(count(*) AS BIGINT) AS cnt
    FROM regs GROUP BY row_idx, bucket
    """


def cm_estimate(registers: dict[tuple[int, int], int], value: str) -> int:
    """Display-path point estimate (≥ true count): min over hash rows.
    Python md5 mirrors the SQL expression exactly."""
    import hashlib

    est = None
    for i in range(CM_D):
        h = hashlib.md5(f"{value}#{i}".encode()).hexdigest()
        b = (int(h[0], 16) * 16 + int(h[1], 16)) % CM_W
        c = registers.get((i, b), 0)
        est = c if est is None else min(est, c)
    return est or 0


# --------------------------------------------------------------------------
# Bloom filter (Bloom, CACM'70): the membership sibling — k bit positions
# per value over an m-bit array; the set-bit table is OR-mergeable
# (distinct union) and the membership test is one-sided (no false
# negatives). Gate = the exact sorted bit table; tests are display-path.
# --------------------------------------------------------------------------

BLOOM_M = 512  # bits
BLOOM_K = 3    # hash rows


def bloom_bit_sql(val_expr: str, row_expr: str) -> str:
    """Bit index for hash row ``row_expr``: first 12 bits of
    md5(val || '#' || row) mod BLOOM_M — standard SQL, both engines."""
    h = f"md5(CAST({val_expr} AS STRING) || '#' || CAST({row_expr} AS STRING))"
    c1 = _HEXVAL.format(c=f"substr({h}, 1, 1)")
    c2 = _HEXVAL.format(c=f"substr({h}, 2, 1)")
    c3 = _HEXVAL.format(c=f"substr({h}, 3, 1)")
    return f"((({c1}) * 256 + ({c2}) * 16 + ({c3})) % {BLOOM_M})"


def bloom_bits(df: DataFrame, value_col: str = "value") -> DataFrame:
    """df → (bit,): the distinct set-bit table, BIGINT, ≤ BLOOM_M rows."""
    rows = df.select(
        F.col(value_col).alias("value"),
        F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("row_idx"),
    )
    return (
        rows.select(
            F.expr(bloom_bit_sql("value", "row_idx")).cast("long").alias("bit")
        )
        .distinct()
    )


def bloom_bits_oracle_sql(values_sql: str, value_expr: str = "value") -> str:
    """DuckDB mirror — same bit expressions (STRING cast valid in both)."""
    return f"""
    WITH v AS ({values_sql}),
    rows_ AS (
      SELECT {value_expr} AS value, r.row_idx
      FROM v, LATERAL (
        SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS row_idx) r)
    SELECT DISTINCT CAST({bloom_bit_sql("value", "row_idx")} AS BIGINT) AS bit
    FROM rows_
    """


def bloom_contains(bits: set[int], value: str) -> bool:
    """Display-path membership test: all k bits set ⇒ maybe-present
    (one-sided — a clear bit proves absence). Python md5 mirror."""
    import hashlib

    for i in range(BLOOM_K):
        h = hashlib.md5(f"{value}#{i}".encode()).hexdigest()
        b = (int(h[0], 16) * 256 + int(h[1], 16) * 16 + int(h[2], 16)) % BLOOM_M
        if b not in bits:
            return False
    return True
