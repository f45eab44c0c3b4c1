"""The r7 unrolled-codegen cosine tier must be BIT-identical to the
higher-order-function fold it replaced (same IEEE-754 operation sequence),
including the per-row size-guard fallback for vectors of unexpected width."""

import struct

import pytest
from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.ann import (
    _cosine_fixed,
    _fence,
    _norm,
    _norm_col,
    cosine_col,
)


def _bits(x) -> bytes:
    # ragged pairs yield NULL cosine in both tiers — encode None distinctly
    return b"NULL" if x is None else struct.pack("d", x)


@pytest.fixture(scope="module")
def vecs(spark):
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(60):
        dim = 64 if i % 7 else 5  # every 7th row is ragged (guard fallback)
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(dim)]))
    return spark.createDataFrame(rows, "vid long, v array<float>")


def test_unrolled_cosine_bit_identical(vecs):
    a = vecs.select(F.col("vid").alias("ida"), F.col("v").alias("va"),
                    _norm_col(F.col("v"), 64).alias("na"))
    b = vecs.select(F.col("vid").alias("idb"), F.col("v").alias("vb"),
                    _norm_col(F.col("v"), 64).alias("nb"))
    pairs = a.join(b, F.col("ida") < F.col("idb"))
    out = pairs.select(
        cosine_col(F.col("va"), F.col("vb")).alias("hof"),
        _cosine_fixed(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"), 64).alias("fast"),
        cosine_col(F.col("va"), F.col("vb"), 64).alias("fast2"),
    ).collect()
    assert len(out) == 60 * 59 // 2
    for r in out:
        assert _bits(r["hof"]) == _bits(r["fast"])
        assert _bits(r["hof"]) == _bits(r["fast2"])


def test_norm_col_matches_hof(vecs):
    out = vecs.select(
        _norm(F.transform(F.col("v"), lambda x: x.cast("double"))).alias("hof"),
        _norm_col(F.col("v"), 64).alias("fast"),
    ).collect()
    for r in out:
        assert _bits(r["hof"]) == _bits(r["fast"])


def test_fence_preserves_value(vecs):
    out = vecs.select(F.col("vid"), _fence(F.col("vid") * 3).alias("fenced")).collect()
    for r in out:
        assert r["fenced"] == r["vid"] * 3


def test_fence_keeps_filter_out_of_join_condition(vecs):
    # the documented purpose: a filter on a fenced projection above a
    # BroadcastNestedLoopJoin must NOT be pushed into the join condition
    a = vecs.select(F.col("vid").alias("ida"), F.col("v").alias("va"))
    b = vecs.select(F.col("vid").alias("idb"), F.col("v").alias("vb"))
    df = (
        a.join(b, F.col("ida") < F.col("idb"))
        .withColumn("c", _fence(cosine_col(F.col("va"), F.col("vb"), 64)))
        .filter(F.col("c") >= 0.5)
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # the non-equi join may plan as BroadcastNestedLoopJoin or CartesianProduct
    # depending on size estimates; either way its condition/filter node must
    # carry only the id inequality — the cosine (recognizable by its SQRT)
    # must stay in the Project above the join.
    assert "NestedLoopJoin" in plan or "CartesianProduct" in plan
    for seg in plan.split("\n\n"):
        if seg.lstrip().startswith(("Join condition", "Condition")) or (
            "NestedLoopJoin" in seg.splitlines()[0] if seg.splitlines() else False
        ):
            if "ida" in seg and "idb" in seg and "c#" not in seg:
                assert "SQRT" not in seg, "cosine leaked into the join condition"
