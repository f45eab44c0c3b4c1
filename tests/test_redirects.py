"""Redirect resolution (operators/redirects.py): pointer-doubling
semantics — terminals, exact hop counts, loops, rho-shapes, the strict
functional gate, the over-limit verdict, and DuckDB recursive parity."""

import pytest

from augmented_codebase_indexer_spark.operators.redirects import (
    resolve_redirects,
    resolve_redirects_sql,
)


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["src"]: (r["terminal"], r["hops"], r["is_cycle"])
        for r in resolve_redirects(df, **kw).collect()
    }


def test_chain_terminals_and_hops(spark):
    got = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        "a": ("d", 3, False),
        "b": ("d", 2, False),
        "c": ("d", 1, False),
    }


def test_self_loop_and_rho(spark):
    # s→s is a 1-cycle; x→y→z→y leads INTO a loop — x never terminates
    # either, so all three are cyclic (RFC 9110 loop verdict)
    got = _resolve(spark, [("s", "s"), ("x", "y"), ("y", "z"), ("z", "y")])
    assert got == {
        "s": (None, None, True),
        "x": (None, None, True),
        "y": (None, None, True),
        "z": (None, None, True),
    }


def test_strict_raises_on_nonfunctional(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="functional"):
        resolve_redirects(df)
    # non-strict: deterministic min-dst resolution
    got = _resolve(spark, [("a", "b"), ("a", "c")], strict=False)
    assert got == {"a": ("b", 1, False)}


def test_over_limit_chain_is_cycle_verdict(spark):
    # 10-hop chain with max_chain_len=4 (rounds cover 2^3=8 hops):
    # unterminated within the budget → same verdict as a loop
    edges = [(f"u{i}", f"u{i+1}") for i in range(10)]
    got = _resolve(spark, edges, max_chain_len=4)
    assert got["u9"] == ("u10", 1, False)
    assert got["u0"] == (None, None, True)
    # and with the default budget the same chain resolves exactly
    got = _resolve(spark, edges)
    assert got["u0"] == ("u10", 10, False)


def test_duckdb_parity(spark):
    import duckdb

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("p", "q"), ("q", "p")]
    lit = " UNION ALL ".join(
        f"SELECT '{s}' AS src, '{d}' AS dst" for s, d in edges
    )
    got = sorted(
        map(
            tuple,
            resolve_redirects(
                spark.createDataFrame(edges, "src string, dst string")
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, duckdb.connect().execute(resolve_redirects_sql(lit)).fetchall())
    )
    assert got == want
