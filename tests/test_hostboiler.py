"""Host template paragraphs (operators/hostboiler.py): planted footer
flagged per host, content paragraph not, min_docs floor, per-doc
duplicate paragraphs counted once, DuckDB parity."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.hostboiler import (
    host_templates,
    host_templates_oracle_sql,
)

FOOTER = "copyright two thousand site chronicle"
# host A: 4 docs, footer on 3 (75% ≥ 1/2 → template); unique bodies not.
# host B: 2 docs, footer on 1 (50% ≥ 1/2 BUT only 1 doc < min_docs=2 → no).
# doc 3 repeats the footer twice → still one attestation.
PARAS = [
    ("a", 1, FOOTER), ("a", 1, "unique body one"),
    ("a", 2, FOOTER), ("a", 2, "unique body two"),
    ("a", 3, FOOTER), ("a", 3, FOOTER), ("a", 3, "unique body three"),
    ("a", 4, "unique body four"),
    ("b", 5, FOOTER), ("b", 5, "host b content"),
    ("b", 6, "other host b content"),
]


def _df(spark):
    return spark.createDataFrame(PARAS, "host string, doc_id long, para string")


def test_planted_template(spark):
    rows = {
        (r["host"], r["para"]): r
        for r in host_templates(_df(spark)).collect()
    }
    fa = rows[("a", FOOTER)]
    assert fa["n_docs"] == 3 and fa["n_host_docs"] == 4  # doc-3 dup = 1
    assert fa["is_template"] is True
    assert fa["share_micro"] == 750_000
    # host b: 1 of 2 docs → 50% but min_docs=2 blocks it
    fb = rows[("b", FOOTER)]
    assert fb["n_docs"] == 1 and fb["is_template"] is False
    assert not rows[("a", "unique body one")]["is_template"]


def test_exact_share_boundary(spark):
    # 2 of 4 docs = exactly 1/2 → ≥ comparison admits it
    rows = {
        (r["host"], r["para"]): r
        for r in host_templates(_df(spark), share=(3, 4)).collect()
    }
    assert rows[("a", FOOTER)]["is_template"] is True  # 3/4 meets 3/4


def test_validation(spark):
    with pytest.raises(ValueError):
        host_templates(_df(spark), share=(0, 2))


def test_matches_duckdb_oracle(spark):
    paras_sql = " UNION ALL ".join(
        f"SELECT '{h}' AS host, {d} AS doc_id, '{p}' AS para"
        for h, d, p in PARAS
    )
    want = sorted(
        tuple(r)
        for r in duckdb.connect()
        .execute(host_templates_oracle_sql(paras_sql))
        .fetchall()
    )
    got = sorted(tuple(r) for r in host_templates(_df(spark)).collect())
    assert got == want and len(got) == 8  # 5 host-a + 3 host-b paras
