"""Coherence disambiguation (operators/disambig.py): the planted
jaguar case — the prior alone picks the majority sense, context
coherence flips it; unambiguous passthrough; no-context fallback;
DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.disambig import (
    disambiguate,
    disambiguate_oracle_sql,
)

# Link graph: 'jaguar' means CAR on 4 pages, ANIMAL on 3 → the prior
# alone says CAR.  Pages establish in-link overlap: ANIMAL co-cited
# with RAINFOREST on p4,p5,p8; CAR co-cited with ENGINE on p1-p3.
# 'rainforest' and 'engine' are unambiguous.
ANCHORS = [
    ("p1", "Jaguar", "CAR"), ("p2", "jaguar", "CAR"),
    ("p3", "jaguar", "CAR"), ("p9", "jaguar", "CAR"),
    ("p4", "jaguar", "ANIMAL"), ("p5", "jaguar", "ANIMAL"),
    ("p1", "engine", "ENGINE"), ("p2", "engine", "ENGINE"),
    ("p3", "engine", "ENGINE"),
    ("p4", "rainforest", "RAINFOREST"), ("p5", "rainforest", "RAINFOREST"),
    ("p8", "rainforest", "RAINFOREST"), ("p8", "jaguar", "ANIMAL"),
]
# doc 1 mentions jaguar in a rainforest context; doc 2 in an engine
# context; doc 3 has no context at all (prior decides → CAR).
MENTIONS = [
    (1, "Jaguar"), (1, "rainforest"),
    (2, "jaguar "), (2, "engine"),
    (3, "jaguar"),
]


def _dfs(spark):
    a = spark.createDataFrame(
        ANCHORS, "src_url string, anchor string, href string")
    m = spark.createDataFrame(MENTIONS, "doc_id long, surface string")
    return m, a


def test_context_flips_the_prior(spark):
    m, a = _dfs(spark)
    rows = {(r["doc_id"], r["surface"]): r
            for r in disambiguate(m, a).collect()}
    # doc 1: rainforest context → ANIMAL despite the CAR-majority prior
    d1 = rows[(1, "jaguar")]
    assert d1["target"] == "ANIMAL" and d1["n_cands"] == 2
    # doc 2: engine context → CAR (prior and coherence agree)
    assert rows[(2, "jaguar")]["target"] == "CAR"
    # doc 3: no context → prior alone → CAR
    d3 = rows[(3, "jaguar")]
    assert d3["target"] == "CAR" and d3["coherence_micro"] == 0
    assert d3["score_micro"] == d3["commonness_micro"] // 2
    # unambiguous passthrough: full prior, NULL coherence
    rf = rows[(1, "rainforest")]
    assert rf["target"] == "RAINFOREST"
    assert rf["commonness_micro"] == 1_000_000
    assert rf["coherence_micro"] is None
    assert rf["score_micro"] == 1_000_000


def test_matches_duckdb_oracle(spark):
    m, a = _dfs(spark)
    a_sql = " UNION ALL ".join(
        f"SELECT '{u}' AS src_url, '{x}' AS anchor, '{h}' AS href"
        for u, x, h in ANCHORS)
    m_sql = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, '{s}' AS surface" for d, s in MENTIONS)
    want = sorted(
        tuple(r) for r in duckdb.connect()
        .execute(disambiguate_oracle_sql(m_sql, a_sql)).fetchall()
    )
    got = sorted(tuple(r) for r in disambiguate(m, a).collect())
    assert got == want and len(got) == 5
