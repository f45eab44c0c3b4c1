"""KG integrity checks (operators/kgquality.py): planted graph with
known cardinality profile, functional violations, and dangling edges."""

import pyspark.sql.functions as F  # noqa: F401

from augmented_codebase_indexer_spark.operators.kgquality import (
    dangling_edges,
    functional_violations,
    predicate_profile,
)

TRIPLES = [
    # capital_of: functional and clean (1 object per subject)
    ("fr", "capital_of", "paris"),
    ("de", "capital_of", "berlin"),
    ("fr", "capital_of", "paris"),  # duplicate assertion, not a violation
    # born_in: declared functional but dirty (alice has 2 objects)
    ("alice", "born_in", "lyon"),
    ("alice", "born_in", "lille"),
    ("bob", "born_in", "bonn"),
    # works_at: naturally multi-valued
    ("alice", "works_at", "acme"),
    ("alice", "works_at", "cnrs"),
    ("bob", "works_at", "acme"),
]


def _t(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string")


def test_predicate_profile_exact(spark):
    prof = {r["pred"]: r for r in predicate_profile(_t(spark)).collect()}
    cap = prof["capital_of"]
    assert (cap["n_triples"], cap["n_subj"], cap["n_obj"], cap["max_out"]) \
        == (2, 2, 2, 1)
    assert cap["functional_micro"] == 1_000_000  # looks functional
    born = prof["born_in"]
    assert (born["n_triples"], born["n_subj"], born["max_out"]) == (3, 2, 2)
    assert born["functional_micro"] == 2 * 1_000_000 // 3
    work = prof["works_at"]
    assert (work["n_triples"], work["n_subj"], work["n_obj"]) == (3, 2, 2)


def test_functional_violations_flags_only_declared_dirty(spark):
    v = functional_violations(
        _t(spark), functional_preds=("capital_of", "born_in"))
    rows = [(r["pred"], r["subj"], r["n_objects"]) for r in v.collect()]
    assert rows == [("born_in", "alice", 2)]
    # works_at is multi-valued but NOT declared functional -> not flagged


def test_dangling_edges(spark):
    edges = spark.createDataFrame(
        [("a", "r", "b"), ("a", "r", "ghost"), ("phantom", "r", "specter")],
        "subj string, pred string, obj string")
    nodes = spark.createDataFrame([("a",), ("b",)], "node_id string")
    got = {(r["subj"], r["obj"]): r["missing"]
           for r in dangling_edges(edges, nodes).collect()}
    assert got == {("a", "ghost"): "obj", ("phantom", "specter"): "both"}


DR_TRIPLES = [
    ("fr", "capital_of", "paris"),      # City->City: conformant
    ("alice", "capital_of", "paris"),   # Person subj: domain violation
    ("alice", "born_in", "acme"),       # Org obj: range violation
    ("bob", "born_in", "ghost"),        # untyped obj: range violation
    ("ghost", "works_at", "acme"),      # untyped subj: domain violation
    ("fr", "works_at", "ghost"),        # wrong subj + untyped obj: both
    ("fr", "likes", "ghost"),           # undeclared pred: unchecked
]
DR_TYPES = [("fr", "City"), ("paris", "City"), ("alice", "Person"),
            ("bob", "Person"), ("acme", "Org")]
DR_DECLS = [("capital_of", "City", "City"), ("born_in", "Person", "City"),
            ("works_at", "Person", "Org")]


def _dr(spark):
    return (
        spark.createDataFrame(DR_TRIPLES,
                              "subj string, pred string, obj string"),
        spark.createDataFrame(DR_TYPES, "node_id string, node_type string"),
        spark.createDataFrame(
            DR_DECLS, "pred string, domain_type string, range_type string"),
    )


def test_domain_range_violations(spark):
    from augmented_codebase_indexer_spark.operators.kgquality import (
        domain_range_violations,
    )

    t, nt, d = _dr(spark)
    got = {(r["subj"], r["pred"], r["obj"]):
           (r["subj_type"], r["obj_type"], r["violation"])
           for r in domain_range_violations(t, nt, d).collect()}
    assert got == {
        ("alice", "capital_of", "paris"): ("Person", "City", "domain"),
        ("alice", "born_in", "acme"): ("Person", "Org", "range"),
        ("bob", "born_in", "ghost"): ("Person", "untyped", "range"),
        ("ghost", "works_at", "acme"): ("untyped", "Org", "domain"),
        ("fr", "works_at", "ghost"): ("City", "untyped", "both"),
    }
    # conformant row and undeclared pred are absent


def test_domain_range_oracle_parity(spark):
    import duckdb

    from augmented_codebase_indexer_spark.operators.kgquality import (
        domain_range_violations,
        domain_range_violations_sql,
    )

    t, nt, d = _dr(spark)
    tsql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in DR_TRIPLES)
    ntsql = " UNION ALL ".join(
        f"SELECT '{n}' AS node_id, '{ty}' AS node_type"
        for n, ty in DR_TYPES)
    dsql = " UNION ALL ".join(
        f"SELECT '{p}' AS pred, '{dm}' AS domain_type, '{rg}' AS range_type"
        for p, dm, rg in DR_DECLS)
    got = sorted(map(tuple, domain_range_violations(t, nt, d).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        domain_range_violations_sql(tsql, ntsql, dsql)).fetchall()))
    assert got == want


def test_oracle_parity(spark):
    import duckdb

    from augmented_codebase_indexer_spark.operators.kgquality import (
        functional_violations_sql,
        predicate_profile_sql,
    )

    tsql = " UNION ALL ".join(
        f"SELECT '{s}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, p, o in TRIPLES)
    con = duckdb.connect()
    got = sorted(map(tuple, predicate_profile(_t(spark)).collect()))
    want = sorted(map(tuple, con.execute(
        predicate_profile_sql(tsql)).fetchall()))
    assert got == want
    got = sorted(map(tuple, functional_violations(
        _t(spark), ("capital_of", "born_in")).collect()))
    want = sorted(map(tuple, con.execute(functional_violations_sql(
        tsql, ("capital_of", "born_in"))).fetchall()))
    assert got == want
