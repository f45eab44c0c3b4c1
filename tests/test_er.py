"""Blocked entity resolution (operators/er.py): planted variant
clusters, exact levenshtein/containment semantics, block-size guard with
observable drops, DuckDB parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.er import (
    er_candidate_pairs,
    er_matches,
    er_matches_oracle_sql,
    oversized_blocks,
)

ENTS = [
    (1, "Acme Corp"),
    (2, "acme-corp"),        # norm-identical to 1 → lev 0
    (3, "Acme Corps"),       # lev 1 + containment
    (4, "Acme Company"),     # lev 4: candidate but NOT a match
    (5, "Zenith Labs"),      # different block entirely
    (6, "zenithlabs"),       # norm-identical to 5
    (7, "ACME CORP"),        # norm-identical to 1 again
    (8, "!!!"),              # normalizes to '' → excluded
]


def _df(spark):
    return spark.createDataFrame(ENTS, "ent_id long, name string")


def test_candidates_blocked_and_scored(spark):
    got = {(r["id_a"], r["id_b"]): (r["lev"], r["contained"])
           for r in er_candidate_pairs(_df(spark)).collect()}
    # acme block pairs all of 1,2,3,4,7; zenith block pairs 5,6; no
    # cross-block pair, no pair involving the empty-norm 8
    assert set(got) == {(1, 2), (1, 3), (1, 4), (1, 7), (2, 3), (2, 4),
                        (2, 7), (3, 4), (3, 7), (4, 7), (5, 6)}
    assert got[(1, 2)] == (0, True)
    assert got[(1, 3)] == (1, True)   # 'acmecorp' ⊂ 'acmecorps'
    assert got[(5, 6)] == (0, True)
    assert got[(1, 4)][0] > 1 and not got[(1, 4)][1]


def test_match_rule(spark):
    got = {(r["id_a"], r["id_b"]) for r in er_matches(_df(spark)).collect()}
    assert (1, 4) not in got and (2, 4) not in got  # lev 4, no containment
    assert {(1, 2), (1, 3), (1, 7), (5, 6)} <= got


def test_block_guard_drops_whole_block_observably(spark):
    big = [(100 + i, f"Mega {i}") for i in range(30)] + [(900, "Solo One")]
    df = spark.createDataFrame(big, "ent_id long, name string")
    pairs = er_candidate_pairs(df, max_block_size=10).collect()
    assert pairs == []  # mega-block dropped whole; solo has no partner
    dropped = oversized_blocks(df, max_block_size=10).collect()
    assert [(r["block"], r["n"]) for r in dropped] == [("mega", 30)]


def test_duckdb_parity(spark):
    ents_sql = " UNION ALL ".join(
        f"SELECT {i} AS ent_id, '{n}' AS name" for i, n in ENTS
    )
    want = sorted(map(tuple, duckdb.connect().execute(
        er_matches_oracle_sql(ents_sql)).fetchall()))
    got = sorted(map(tuple, er_matches(_df(spark)).collect()))
    assert got == want


def test_same_name_ids_pair_once_with_min_id_orientation(spark):
    # r7 name-grain rewrite: identical NAME strings on distinct ids must
    # pair exactly once, oriented (id_a < id_b), with name_a = the smaller
    # id's name — the (n_a == n_b) branch of the expansion — and the full
    # rows must still match the id-grain DuckDB oracle.
    ents = [(10, "Dup Co"), (20, "Dup Co"), (30, "Dup Co"), (40, "dupco X")]
    df = spark.createDataFrame(ents, "ent_id long, name string")
    rows = er_matches(df).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert {(10, 20), (10, 30), (20, 30)} <= got
    assert all(r["id_a"] < r["id_b"] for r in rows)
    ents_sql = " UNION ALL ".join(
        f"SELECT {i} AS ent_id, '{n}' AS name" for i, n in ents
    )
    import duckdb as _dk
    want = sorted(map(tuple, _dk.connect().execute(
        er_matches_oracle_sql(ents_sql)).fetchall()))
    assert sorted(map(tuple, rows)) == want
