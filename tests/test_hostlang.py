"""Host-language profile (operators/hostlang.py): majority verdicts,
strict-majority mixed gate, argmax tie-break, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.hostlang import (
    host_language_profile,
    host_language_profile_sql,
)

# h1: 3 en / 1 de → majority en, 1 outlier.  h2: 2 en / 2 fr → no
# strict majority → mixed (tie → 'en' wins the argmax lexicographically).
# h3: all one language → clean.
DOCS = [
    ("h1", "en"), ("h1", "en"), ("h1", "en"), ("h1", "de"),
    ("h2", "en"), ("h2", "fr"), ("h2", "fr"), ("h2", "en"),
    ("h3", "pt"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "host string, lang string")


def test_profiles(spark):
    rows = {r["host"]: r for r in host_language_profile(_df(spark)).collect()}
    h1 = rows["h1"]
    assert h1["majority_lang"] == "en" and h1["n_majority"] == 3
    assert h1["n_outliers"] == 1 and h1["outlier_share_micro"] == 250_000
    assert h1["is_mixed"] is False
    h2 = rows["h2"]
    assert h2["majority_lang"] == "en"  # 2-2 tie → lexicographic
    assert h2["is_mixed"] is True
    h3 = rows["h3"]
    assert h3["n_outliers"] == 0 and h3["is_mixed"] is False


def test_matches_duckdb_oracle(spark):
    d_sql = " UNION ALL ".join(
        f"SELECT '{h}' AS host, '{l}' AS lang" for h, l in DOCS)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(host_language_profile_sql(d_sql)).fetchall()
    )
    got = sorted(
        tuple(r) for r in host_language_profile(_df(spark)).collect())
    assert got == want and len(got) == 3
