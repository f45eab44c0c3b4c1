"""Entity salience (operators/salience.py): frequency+position blend,
deterministic rank tie-break, missing-length docs drop, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.salience import (
    entity_salience,
    entity_salience_oracle_sql,
)

# doc 1 (100 tokens): X mentioned 3× starting at 0, Y once at 90 →
# X is the subject.  doc 2 (50 tokens): single entity.  doc 9 has
# mentions but no length row → drops.
MENTIONS = [
    (1, "X", 0), (1, "X", 40), (1, "X", 70), (1, "Y", 90),
    (2, "Z", 10),
    (9, "ghost", 0),
]
TOKENS = [(1, 100), (2, 50)]


def _dfs(spark):
    m = spark.createDataFrame(
        MENTIONS, "doc_id long, entity string, pos long"
    )
    t = spark.createDataFrame(TOKENS, "doc_id long, n_tokens long")
    return m, t


def test_features_and_rank(spark):
    m, t = _dfs(spark)
    rows = {(r["doc_id"], r["entity"]): r
            for r in entity_salience(m, t).collect()}
    x = rows[(1, "X")]
    assert x["n_mentions"] == 3 and x["first_pos"] == 0
    assert x["freq_micro"] == 750_000      # 3 of 4 mentions
    assert x["early_micro"] == 1_000_000   # position 0
    assert x["salience_micro"] == 875_000
    assert x["rank"] == 1
    y = rows[(1, "Y")]
    assert y["freq_micro"] == 250_000
    assert y["early_micro"] == 100_000     # 1e6 - 90*1e6//100
    assert y["rank"] == 2
    assert (9, "ghost") not in rows        # no length row → absent
    assert rows[(2, "Z")]["rank"] == 1


def test_rank_tiebreak_is_entity_order(spark):
    # two entities with identical features → lexicographic entity wins
    m = spark.createDataFrame(
        [(1, "b", 5), (1, "a", 5)], "doc_id long, entity string, pos long"
    )
    t = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    rows = {r["entity"]: r["rank"] for r in entity_salience(m, t).collect()}
    assert rows == {"a": 1, "b": 2}


def test_matches_duckdb_oracle(spark):
    m, t = _dfs(spark)
    m_sql = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, '{e}' AS entity, {p} AS pos"
        for d, e, p in MENTIONS
    )
    t_sql = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, {n} AS n_tokens" for d, n in TOKENS
    )
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(entity_salience_oracle_sql(m_sql, t_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in entity_salience(m, t).collect())
    assert got == want and len(got) == 3
