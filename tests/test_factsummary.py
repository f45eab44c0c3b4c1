"""Entity fact summaries (operators/factsummary.py): rarity ordering,
deterministic ties, top-k cut, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.factsummary import (
    entity_fact_summary,
    entity_fact_summary_oracle_sql,
)

FACTS = [
    # works_at: carried by 3 subjects (common); prize: by 1 (rare)
    ("e1", "works_at", "acme"), ("e2", "works_at", "acme"),
    ("e3", "works_at", "globex"),
    ("e1", "prize", "nobel"),
    ("e1", "lives_in", "paris"), ("e2", "lives_in", "rome"),
    ("e1", "works_at", "acme"),  # dup collapses
]


def _df(spark):
    return spark.createDataFrame(FACTS, "subj string, pred string, obj string")


def test_rarity_ordering_and_cut(spark):
    rows = {(r["subj"], r["rank"]): (r["pred"], r["pred_df"])
            for r in entity_fact_summary(_df(spark), k=2).collect()}
    # e1: prize (df 1) beats lives_in (df 2) beats works_at (df 3)
    assert rows[("e1", 1)] == ("prize", 1)
    assert rows[("e1", 2)] == ("lives_in", 2)
    assert ("e1", 3) not in rows  # works_at cut by k=2
    assert rows[("e2", 1)] == ("lives_in", 2)
    assert rows[("e3", 1)] == ("works_at", 3)


def test_matches_duckdb_oracle(spark):
    f_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in FACTS)
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        entity_fact_summary_oracle_sql(f_sql, k=2)).fetchall())
    got = sorted(tuple(r)
                 for r in entity_fact_summary(_df(spark), k=2).collect())
    assert got == want
