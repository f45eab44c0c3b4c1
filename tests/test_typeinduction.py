"""Domain/range induction (operators/typeinduction.py): hand majorities,
deterministic tie-break, untyped-end behavior, violations, DuckDB
parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.typeinduction import (
    induce_domain_range,
    induce_domain_range_oracle_sql,
    type_violations,
    type_violations_oracle_sql,
)

MICRO = 1_000_000

FACTS = [
    # works_at: subjects 3 person + 1 bot (noise), objects all org
    ("p1", "works_at", "acme"), ("p2", "works_at", "globex"),
    ("p3", "works_at", "acme"), ("bot9", "works_at", "acme"),
    # lives_in: typed subjects, objects city; c9 is UNTYPED (ignored)
    ("p1", "lives_in", "paris"), ("p2", "lives_in", "c9"),
    # tie_pred: one 'a'-typed and one 'b'-typed subject -> tie breaks
    # on type text ('ta' < 'tb'); objects untyped -> NULL range
    ("x1", "tie_pred", "z1"), ("x2", "tie_pred", "z2"),
]

TYPES = [
    ("p1", "person"), ("p2", "person"), ("p3", "person"),
    ("bot9", "bot"),
    ("acme", "org"), ("globex", "org"),
    ("paris", "city"),
    ("x1", "ta"), ("x2", "tb"),
]


def _dfs(spark):
    return (
        spark.createDataFrame(FACTS, "subj string, pred string, obj string"),
        spark.createDataFrame(TYPES, "entity string, type string"),
    )


def test_induction(spark):
    f, t = _dfs(spark)
    ind = {r["pred"]: r for r in induce_domain_range(f, t).collect()}
    wa = ind["works_at"]
    assert wa["domain_type"] == "person" and wa["domain_support"] == 3
    assert wa["domain_typed"] == 4
    assert wa["domain_share_micro"] == 3 * MICRO // 4
    assert wa["range_type"] == "org" and wa["range_share_micro"] == MICRO
    li = ind["lives_in"]
    assert li["range_type"] == "city" and li["range_typed"] == 1
    tp = ind["tie_pred"]
    assert tp["domain_type"] == "ta"  # count tie -> type text order
    assert tp["range_type"] is None   # objects untyped


def test_violations(spark):
    f, t = _dfs(spark)
    ind = induce_domain_range(f, t)
    v = {(r["subj"], r["pred"], r["fact_end"]): r
         for r in type_violations(f, t, ind).collect()}
    # the bot subject contradicts works_at's induced person domain
    k = ("bot9", "works_at", "subj")
    assert k in v and v[k]["found_type"] == "bot"
    assert v[k]["expected_type"] == "person"
    # the tie loser 'tb' subject contradicts tie_pred's induced 'ta'
    assert ("x2", "tie_pred", "subj") in v
    # typed-and-conforming facts are silent; untyped ends are silent
    assert len(v) == 2


def test_matches_duckdb_oracle(spark):
    f, t = _dfs(spark)
    f_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in FACTS)
    t_sql = " UNION ALL ".join(
        f"SELECT '{e}' AS entity, '{ty}' AS type" for e, ty in TYPES)
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        induce_domain_range_oracle_sql(f_sql, t_sql)).fetchall())
    got = sorted(tuple(r) for r in induce_domain_range(f, t).collect())
    assert got == want and len(got) == 3

    want = sorted(tuple(r) for r in con.execute(
        type_violations_oracle_sql(f_sql, t_sql)).fetchall())
    got = sorted(tuple(r) for r in
                 type_violations(f, t, induce_domain_range(f, t)).collect())
    assert got == want and len(got) == 2


def test_induced_declarations_bar(spark):
    from augmented_codebase_indexer_spark.operators.typeinduction import (
        induced_declarations,
        induced_declarations_oracle_sql,
    )

    f, t = _dfs(spark)
    ind = induce_domain_range(f, t)
    # bar share>=0.6, typed>=3: works_at qualifies (3/4 person, 4 org);
    # lives_in fails min_typed on the range (1 typed city);
    # tie_pred fails NULL range
    got = {tuple(r) for r in induced_declarations(ind).collect()}
    assert got == {("works_at", "person", "org")}
    # loosening the bar admits lives_in
    loose = {tuple(r) for r in
             induced_declarations(ind, min_typed=1).collect()}
    assert ("lives_in", "person", "city") in loose
    # DuckDB mirror parity
    f_sql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in FACTS)
    t_sql = " UNION ALL ".join(
        f"SELECT '{e}' AS entity, '{ty}' AS type" for e, ty in TYPES)
    want = {tuple(r) for r in duckdb.connect().execute(
        induced_declarations_oracle_sql(f_sql, t_sql)).fetchall()}
    assert got == want


def test_increment_is_batch_boundary_invariant(spark):
    from augmented_codebase_indexer_spark.operators.typeinduction import (
        induction_increment,
    )

    f, t = _dfs(spark)
    one_shot = sorted(tuple(r)
                      for r in induce_domain_range(f, t).collect())
    # split facts 2/1 with an OVERLAPPING duplicate planted in batch 2
    b1 = spark.createDataFrame(
        FACTS[:5], "subj string, pred string, obj string")
    b2 = spark.createDataFrame(
        FACTS[4:] + [FACTS[0]], "subj string, pred string, obj string")
    ind1, st, seen = induction_increment(b1, t)
    ind2, st2, seen2 = induction_increment(
        b2, t, state=st, seen=seen)
    got = sorted(tuple(r) for r in ind2.collect())
    assert got == one_shot
    # the overlap fact was not double counted: state equals the
    # one-shot evidence counts
    _, st_one, _ = induction_increment(f, t)
    assert (sorted(tuple(r) for r in st2.collect())
            == sorted(tuple(r) for r in st_one.collect()))
