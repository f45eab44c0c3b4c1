"""Truth fusion (operators/fusion.py): planted source-reliability
scenario where iterative re-trust FLIPS a fact that uniform voting gets
wrong, plus exact trust values and DuckDB oracle parity."""

import pyspark.sql.functions as F  # noqa: F401

from augmented_codebase_indexer_spark.operators.fusion import (
    source_trust,
    source_trust_oracle_sql,
    truth_fusion,
    truth_fusion_oracle_sql,
)

# 3 honest sources (h1-h3), 2 coordinated liars (l1, l2).
# - 'cap' facts g1-g4: honest majority -> calibrates trust.
# - fact x/born: liars outnumber the lone honest h1 -> uniform voting
#   picks the lie; after one re-trust round the lie loses.
# - fact y/home: h2 vs h3 at equal trust -> tie breaks to smallest obj.
CLAIMS = (
    [(h, f"g{k}", "cap", f"R{k}") for h in ("h1", "h2", "h3")
     for k in range(1, 5)]
    + [(liar, f"g{k}", "cap", f"W{k}") for liar in ("l1", "l2")
       for k in range(1, 5)]
    + [("l1", "x", "born", "wrongX"), ("l2", "x", "born", "wrongX"),
       ("h1", "x", "born", "rightX")]
    + [("h2", "y", "home", "aaa"), ("h3", "y", "home", "bbb")]
)


def _a(spark):
    return spark.createDataFrame(
        CLAIMS, "src string, subj string, pred string, obj string")


def test_retrust_flips_the_outvoted_truth(spark):
    got = {(r["subj"], r["pred"]): (r["obj"], r["support_micro"], r["n_src"])
           for r in truth_fusion(_a(spark), iters=2).collect()}
    # the lie wins the uniform vote 2e6 : 1e6, but after re-trust the
    # liars' cap record caps their weight and the single honest source
    # wins the final vote
    assert got[("x", "born")] == ("rightX", 1_000_000, 1)
    for k in range(1, 5):
        assert got[(f"g{k}", "cap")] == (f"R{k}", 2_800_000, 3)
    # equal-trust tie -> lexicographically smallest obj
    assert got[("y", "home")] == ("aaa", 1_000_000, 1)


def test_source_trust_exact_integers(spark):
    got = {r["src"]: (r["n_claims"], r["n_correct"], r["trust_micro"])
           for r in source_trust(_a(spark), iters=2).collect()}
    assert got == {
        "h1": (5, 5, 1_000_000),
        "h2": (5, 5, 1_000_000),
        "h3": (5, 4, 800_000),   # loses the y tie to h2's 'aaa'
        "l1": (5, 0, 0),
        "l2": (5, 0, 0),
    }


def test_uniform_vote_alone_gets_x_wrong(spark):
    # regression guard on the planted scenario itself: round-0 support
    # for the lie really is larger, so the flip is the algorithm's work
    from augmented_codebase_indexer_spark.operators.fusion import (
        _claims,
        _vote,
        _winners,
    )

    a = _claims(_a(spark))
    uniform = a.select("src").distinct().withColumn(
        "trust_micro", F.lit(1_000_000).cast("long"))
    w = {(r["subj"], r["pred"]): r["obj"]
         for r in _winners(_vote(a, uniform)).collect()}
    assert w[("x", "born")] == "wrongX"


def test_oracle_parity(spark):
    import duckdb

    asql = " UNION ALL ".join(
        f"SELECT '{s}' AS src, '{sj}' AS subj, '{p}' AS pred, '{o}' AS obj"
        for s, sj, p, o in CLAIMS)
    con = duckdb.connect()
    for frame, osql in (
        (truth_fusion(_a(spark), iters=2),
         truth_fusion_oracle_sql(asql, iters=2)),
        (source_trust(_a(spark), iters=2),
         source_trust_oracle_sql(asql, iters=2)),
    ):
        got = sorted(map(tuple, frame.collect()))
        want = sorted(map(tuple, con.execute(osql).fetchall()))
        assert got == want


def test_publish_gate_drops_what_fusion_cannot_fix(spark):
    # liar-ONLY fact: no honest assertion exists, so fusion must publish
    # the lie — the domain/range QA gate is the only thing that kills it
    from augmented_codebase_indexer_spark.operators.kgquality import (
        domain_range_violations,
    )

    claims = CLAIMS + [("l1", "q", "cap", "JUNKQ"), ("l2", "q", "cap", "JUNKQ")]
    a = spark.createDataFrame(
        claims, "src string, subj string, pred string, obj string")
    w = truth_fusion(a, iters=2)
    assert {r["obj"] for r in w.filter("subj = 'q'").collect()} == {"JUNKQ"}

    types = ([(f"g{k}", "Place") for k in range(1, 5)]
             + [("q", "Place"), ("x", "Place"), ("y", "Place")]
             + [(f"R{k}", "City") for k in range(1, 5)]
             + [("rightX", "City"), ("aaa", "City"), ("bbb", "City")])
    # JUNKQ and every W* stay untyped -> closed-world violation
    nt = spark.createDataFrame(types, "node_id string, node_type string")
    d = spark.createDataFrame(
        [("cap", "Place", "City"), ("born", "Place", "City"),
         ("home", "Place", "City")],
        "pred string, domain_type string, range_type string")
    v = domain_range_violations(w.select("subj", "pred", "obj"), nt, d)
    published = w.join(v.select("subj", "pred", "obj"),
                       ["subj", "pred", "obj"], "left_anti")
    got = {(r["subj"], r["pred"], r["obj"]) for r in published.collect()}
    assert ("q", "cap", "JUNKQ") not in got          # QA killed the lie
    assert ("x", "born", "rightX") in got            # fusion fixed this one
    assert {(f"g{k}", "cap", f"R{k}") for k in range(1, 5)} <= got


def test_iters_zero_raises(spark):
    try:
        truth_fusion(_a(spark), iters=0)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "iters" in str(e)
