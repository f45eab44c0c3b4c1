"""HLL registers (operators/hll.py): cross-engine register identity,
mergeability (sketch of union == max of sketches), estimator accuracy,
and rho edge semantics."""

from augmented_codebase_indexer_spark.operators.hll import (
    M,
    hll_estimate,
    hll_registers,
    hll_registers_oracle_sql,
)


def _vals(spark, n, prefix="tok"):
    return spark.range(n).selectExpr(f"concat('{prefix}', id) AS value")


def test_registers_match_duckdb(spark):
    import duckdb

    got = sorted(
        map(tuple, hll_registers(_vals(spark, 500)).collect())
    )
    want = sorted(map(tuple, duckdb.connect().execute(
        hll_registers_oracle_sql(
            "SELECT 'tok' || CAST(range AS VARCHAR) AS value FROM range(500)"
        )
    ).fetchall()))
    assert got == want


def test_merge_equals_union(spark):
    import pyspark.sql.functions as F

    a = _vals(spark, 300, "a")
    b = _vals(spark, 300, "b")
    direct = {r["bucket"]: r["max_rho"]
              for r in hll_registers(a.unionAll(b)).collect()}
    merged = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(a).unionByName(hll_registers(b))
        .groupBy("bucket").agg(F.max("max_rho").alias("max_rho")).collect()
    }
    assert direct == merged  # the algebraic-merge property


def test_estimate_within_expected_error(spark):
    for n in (200, 2000):
        regs = {r["bucket"]: r["max_rho"]
                for r in hll_registers(_vals(spark, n)).collect()}
        est = hll_estimate(regs)
        # m=64 → σ ≈ 13%; allow 4σ
        assert abs(est - n) / n < 0.52, (n, est)


def test_duplicates_do_not_move_registers(spark):
    once = {r["bucket"]: r["max_rho"]
            for r in hll_registers(_vals(spark, 100)).collect()}
    tripled = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(
            _vals(spark, 100).unionAll(_vals(spark, 100))
            .unionAll(_vals(spark, 100))
        ).collect()
    }
    assert once == tripled
    assert sum(1 for _ in once) <= M


def test_cm_registers_match_duckdb(spark):
    import duckdb

    from augmented_codebase_indexer_spark.operators.hll import (
        cm_registers,
        cm_registers_oracle_sql,
    )

    vals = spark.range(400).selectExpr("concat('t', id % 37) AS value")
    got = sorted(map(tuple, cm_registers(vals).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        cm_registers_oracle_sql(
            "SELECT 't' || CAST(range % 37 AS VARCHAR) AS value FROM range(400)"
        )
    ).fetchall()))
    assert got == want


def test_cm_estimate_one_sided_and_merge(spark):
    import pyspark.sql.functions as F

    from augmented_codebase_indexer_spark.operators.hll import (
        CM_W,
        cm_estimate,
        cm_registers,
    )

    # heavy hitter 'hot' x 200 over light tail
    hot = spark.range(200).selectExpr("'hot' AS value")
    tail = spark.range(300).selectExpr("concat('u', id) AS value")
    regs = {(r["row_idx"], r["bucket"]): r["cnt"]
            for r in cm_registers(hot.unionAll(tail)).collect()}
    est = cm_estimate(regs, "hot")
    assert est >= 200                       # one-sided guarantee
    assert est <= 200 + (500 * 4) // CM_W   # loose collision bound
    # merge: sum of two sketches == sketch of the multiset union
    a, b = hot, tail
    merged = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in cm_registers(a).unionByName(cm_registers(b))
        .groupBy("row_idx", "bucket").agg(F.sum("cnt").alias("cnt")).collect()
    }
    assert merged == regs


def test_bloom_bits_match_duckdb_and_no_false_negatives(spark):
    import duckdb

    from augmented_codebase_indexer_spark.operators.hll import (
        bloom_bits,
        bloom_bits_oracle_sql,
        bloom_contains,
    )

    vals = spark.range(150).selectExpr("concat('k', id) AS value")
    got = sorted(r["bit"] for r in bloom_bits(vals).collect())
    want = sorted(r[0] for r in duckdb.connect().execute(
        bloom_bits_oracle_sql(
            "SELECT 'k' || CAST(range AS VARCHAR) AS value FROM range(150)"
        )
    ).fetchall())
    assert got == want
    bits = set(got)
    # one-sided: every inserted key tests positive
    assert all(bloom_contains(bits, f"k{i}") for i in range(150))
    # and absence is mostly detected (fp rate for m=512,k=3,n=150 ≈ 11%)
    fp = sum(bloom_contains(bits, f"absent{i}") for i in range(400))
    assert fp < 400 * 0.3, fp
