"""Cross-engine parity for the libm-free fixed-point integer log
(``functions/intlog.py``) — the construction that removes ``ln`` from
every oracle-gated dataflow (VERDICT r5 Next #1: the lm_quality driver
cell was red two rounds because ``round(ln(p)·1e6)`` is hostage to the
evaluating engine's libm build)."""

import math
import random

import duckdb
import pytest

from augmented_codebase_indexer_spark.functions.intlog import (
    duckdb_ln_micro_sql,
    ln_micro_py,
    with_ln_micro,
)


def _cases(n_random: int, seed: int = 7) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    cases = [
        (1, 2), (1, 3), (2, 3), (1, 1), (7, 5), (1000000, 3),
        (1, 10**13), (999999999999, 10**12),
        (1, 2**61), (2**61, 1), (2**61 - 1, 2**61), (3, 2), (2, 1),
    ]
    for _ in range(n_random):
        d = rng.randint(1, 10**13)
        cases.append((rng.randint(1, d), d))
    return cases


def test_accuracy_vs_libm():
    """The defined unit tracks true micro-nats to ≤ 2 everywhere tried:
    the random 10^13-scale sweep plus an exhaustive small-rational grid
    (where the round-4 half-way ties lived)."""
    for n, d in _cases(4000):
        assert abs(ln_micro_py(n, d) - round(math.log(n / d) * 1e6)) <= 2, (n, d)
    for d in range(1, 300):
        for n in range(1, d + 1):
            got, want = ln_micro_py(n, d), round(math.log(n / d) * 1e6)
            assert abs(got - want) <= 2, (n, d, got, want)


def test_duckdb_matches_python_mirror():
    cases = _cases(2000)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (n BIGINT, d BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    sql = duckdb_ln_micro_sql("SELECT n, d FROM t", "n", "d", "lnm", "n, d")
    for n, d, got in con.execute(sql).fetchall():
        assert got == ln_micro_py(n, d), (n, d, got, ln_micro_py(n, d))


def test_spark_matches_python_mirror(spark):
    cases = _cases(300, seed=11)
    df = spark.createDataFrame(cases, "n long, d long")
    out = {(r.n, r.d): r.lnm for r in with_ln_micro(df, "n", "d", "lnm").collect()}
    for n, d in cases:
        assert out[(n, d)] == ln_micro_py(n, d), (n, d)


def test_domain_guard():
    with pytest.raises(ValueError):
        ln_micro_py(0, 5)
    with pytest.raises(ValueError):
        ln_micro_py(5, 0)


def test_monotone_in_ratio():
    """Quantization must preserve order of clearly-separated ratios
    (argmax / bucket semantics depend on it)."""
    vals = [ln_micro_py(n, 1000) for n in range(1, 1001, 7)]
    assert vals == sorted(vals)
