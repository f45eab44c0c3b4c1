"""SCD2 temporal-KG gates: pure-python mirror on a planted history,
snapshot semantics at interval edges, and the one-entity-key-exchange
plan property the module docstring promises."""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from augmented_codebase_indexer_spark.operators.temporal import (
    scd2_intervals,
    scd2_merge,
    snapshot_asof,
    snapshot_diff,
)

# (subj, pred, obj, ts) — one key with runs [a,a | b | a,a,a], a second
# key with a single run, plus a (key, ts) collision that must collapse
# to min(obj) deterministically
FACTS = [
    ("E1", "ceo_of", "alice", 100),
    ("E1", "ceo_of", "alice", 200),
    ("E1", "ceo_of", "bob", 300),
    ("E1", "ceo_of", "alice", 400),
    ("E1", "ceo_of", "alice", 500),
    ("E1", "ceo_of", "alice", 600),
    ("E2", "hq_in", "paris", 150),
    ("E2", "hq_in", "zurich", 150),  # collision: min() keeps 'paris'
]

EXPECTED = [
    # subj, pred, obj, valid_from, valid_to, is_current, n_obs
    ("E1", "ceo_of", "alice", 100, 300, False, 2),
    ("E1", "ceo_of", "bob", 300, 400, False, 1),
    ("E1", "ceo_of", "alice", 400, None, True, 3),
    ("E2", "hq_in", "paris", 150, None, True, 1),
]


def _scd2(spark):
    return scd2_intervals(spark.createDataFrame(FACTS, ["subj", "pred", "obj", "ts"]))


def test_scd2_planted_history(spark):
    got = sorted(
        tuple(r) for r in _scd2(spark).collect()
    )
    assert got == sorted(EXPECTED)


def test_snapshot_edges(spark):
    scd2 = _scd2(spark).persist()
    # valid_from inclusive, valid_to exclusive
    at = lambda t: {
        (r["subj"], r["obj"]) for r in snapshot_asof(scd2, t).collect()
    }
    assert at(99) == set()
    assert at(100) == {("E1", "alice")}
    assert at(299) == {("E1", "alice"), ("E2", "paris")}
    assert at(300) == {("E1", "bob"), ("E2", "paris")}
    assert at(400) == {("E1", "alice"), ("E2", "paris")}
    assert at(10_000) == {("E1", "alice"), ("E2", "paris")}
    scd2.unpersist()


def test_scd2_single_entity_key_exchange(spark):
    """All windows/groupBys key on (subj, pred) or a superset, so the
    whole operator costs ONE hash exchange (plus AQE reads)."""
    # pred must be a REAL column: a literal constant-folds out of every
    # partitioning expression and fakes a cheaper plan than production gets
    df = scd2_intervals(
        spark.range(1000).select(
            (F.col("id") % 20).cast("string").alias("subj"),
            (F.col("id") % 3 == 0).cast("string").alias("pred"),
            (F.col("id") % 3).cast("string").alias("obj"),
            F.col("id").alias("ts"),
        )
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "SinglePartition" not in plan, plan


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_scd2_merge_converges_for_any_split(spark):
    """Incremental merge == full recompute for every prefix/suffix split,
    including out-of-order arrival (the batch carries EARLIER timestamps
    than facts already folded in — a retroactive backfill)."""
    full = spark.createDataFrame(FACTS, ["subj", "pred", "obj", "ts"])
    want = _rows(scd2_intervals(full))
    for cut in (1, 3, 5, 7):
        old = spark.createDataFrame(FACTS[:cut], ["subj", "pred", "obj", "ts"])
        batch = spark.createDataFrame(FACTS[cut:], ["subj", "pred", "obj", "ts"])
        got = scd2_merge(scd2_intervals(old), old, batch)
        assert _rows(got) == want, f"cut={cut}"
    # out-of-order: fold the LATE half first, then backfill the early half
    late = spark.createDataFrame(FACTS[4:], ["subj", "pred", "obj", "ts"])
    early = spark.createDataFrame(FACTS[:4], ["subj", "pred", "obj", "ts"])
    assert _rows(scd2_merge(scd2_intervals(late), late, early)) == want


def test_scd2_merge_untouched_keys_pass_through(spark):
    """A batch touching only E2 must not recompute (or reorder) E1's
    version chain — E1 rows come through the anti-join verbatim."""
    old = spark.createDataFrame(FACTS, ["subj", "pred", "obj", "ts"])
    scd2 = scd2_intervals(old)
    batch = spark.createDataFrame(
        [("E2", "hq_in", "lisbon", 900)], ["subj", "pred", "obj", "ts"]
    )
    merged = scd2_merge(scd2, old, batch)
    e1_before = _rows(scd2.filter(F.col("subj") == "E1"))
    assert _rows(merged.filter(F.col("subj") == "E1")) == e1_before
    e2 = {(r["obj"], r["valid_from"], r["valid_to"], r["is_current"])
          for r in merged.filter(F.col("subj") == "E2").collect()}
    assert e2 == {("paris", 150, 900, False), ("lisbon", 900, None, True)}


def _py_scd2(facts):
    """Pure-python mirror: dedup (key, ts) by min(val), then run-length
    collapse per key ordered by ts."""
    dedup = {}
    for subj, pred, obj, ts in facts:
        k = (subj, pred, ts)
        dedup[k] = obj if k not in dedup else min(dedup[k], obj)
    by_key = {}
    for (subj, pred, ts), obj in sorted(dedup.items()):
        by_key.setdefault((subj, pred), []).append((ts, obj))
    out = []
    for (subj, pred), obs in by_key.items():
        runs = []
        for ts, obj in sorted(obs):
            if runs and runs[-1][0] == obj:
                runs[-1][2] += 1
            else:
                runs.append([obj, ts, 1])
        for i, (obj, vf, n) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            out.append((subj, pred, obj, vf, vt, vt is None, n))
    return sorted(out)


facts_strategy = st.lists(
    st.tuples(
        st.sampled_from(["E1", "E2", "E3"]),
        st.sampled_from(["p", "q"]),
        st.sampled_from(["a", "b", "c"]),
        st.integers(0, 20),
    ),
    min_size=1,
    max_size=40,
)


@given(facts_strategy, st.integers(0, 39))
@settings(max_examples=12, deadline=None)
def test_scd2_property_vs_python_and_merge(spark, facts, cut):
    """Random histories (colliding timestamps, repeated values, several
    keys): SCD2 == the pure-python mirror, and the incremental merge of
    any split equals the full recompute."""
    cut = min(cut, len(facts) - 1)
    full = spark.createDataFrame(facts, ["subj", "pred", "obj", "ts"])
    got = _rows(scd2_intervals(full))
    assert got == _py_scd2(facts)
    old_f, batch_f = facts[:cut], facts[cut:]
    if old_f and batch_f:
        old = spark.createDataFrame(old_f, ["subj", "pred", "obj", "ts"])
        batch = spark.createDataFrame(batch_f, ["subj", "pred", "obj", "ts"])
        assert _rows(scd2_merge(scd2_intervals(old), old, batch)) == got


def test_snapshot_diff_planted(spark):
    """Between t=250 (E1→alice, E2→paris) and t=350 (E1→bob, E2→paris):
    E1 changed, E2 unchanged (absent). Across a boundary where a key has
    no version yet → 'added'; the reverse direction reports 'removed'."""
    scd2 = _scd2(spark).persist()
    d = {(r["subj"], r["pred"]): (r["old_obj"], r["new_obj"], r["change"])
         for r in snapshot_diff(scd2, 250, 350).collect()}
    assert d == {("E1", "ceo_of"): ("alice", "bob", "changed")}
    d2 = {(r["subj"], r["pred"]): r["change"]
          for r in snapshot_diff(scd2, 120, 200).collect()}
    assert d2 == {("E2", "hq_in"): "added"}
    d3 = {(r["subj"], r["pred"]): r["change"]
          for r in snapshot_diff(scd2, 200, 120).collect()}
    assert d3 == {("E2", "hq_in"): "removed"}
    scd2.unpersist()


def test_scd2_over_extracted_triples(spark, corpus_dir):
    """The real composition: pages → extract → OpenIE → link, then SCD2
    over the resolved triples keyed by (subj_id, pred) with the page's
    crawl timestamp — the temporal KG the input_hint's warc_ts exists
    for. Structural gates: version chains are gap-free with exactly one
    live version per key, and n_obs conserves the deduped fact count."""
    from augmented_codebase_indexer_spark.operators.extraction import (
        broadcast_aliases,
        extract_stage,
        triple_stage,
    )
    from augmented_codebase_indexer_spark.operators.linking import (
        broadcast_gazetteer,
        linking_stage,
    )

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    gaz = [r.asDict() for r in
           spark.read.parquet(f"{corpus_dir}/gazetteer.parquet").collect()]
    kg = linking_stage(
        triple_stage(
            extract_stage(pages).filter(
                (F.col("lang") == "en") & (F.length("extracted_text") > 0)
            ),
            broadcast_aliases(spark, [g["alias"] for g in gaz]),
        ),
        broadcast_gazetteer(spark, gaz),
    ).filter(F.col("resolved"))
    facts = kg.join(
        pages.select("url", F.col("warc_ts").cast("long").alias("ts")), "url"
    ).select("subj_id", "pred", F.col("obj_id").alias("obj"), "ts")
    facts.cache()
    n_dedup = facts.groupBy("subj_id", "pred", "ts").count().count()
    scd2 = scd2_intervals(facts, key_cols=("subj_id", "pred"))
    rows = scd2.collect()
    assert rows, "no triples extracted"
    assert sum(r["n_obs"] for r in rows) == n_dedup
    by_key = {}
    for r in sorted(rows, key=lambda r: (r["subj_id"], r["pred"], r["valid_from"])):
        by_key.setdefault((r["subj_id"], r["pred"]), []).append(r)
    for versions in by_key.values():
        assert sum(v["is_current"] for v in versions) == 1
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"] and a["obj"] != b["obj"]
    facts.unpersist()


def test_scd2_run_compression_bounds(spark):
    """n_obs sums back to the deduped observation count and versions per
    key are ordered, non-overlapping, and gap-free."""
    rows = _scd2(spark).collect()
    assert sum(r["n_obs"] for r in rows) == len(FACTS) - 1  # one collision
    by_key = {}
    for r in sorted(rows, key=lambda r: (r["subj"], r["pred"], r["valid_from"])):
        by_key.setdefault((r["subj"], r["pred"]), []).append(r)
    for versions in by_key.values():
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"]  # gap-free chain
            assert a["obj"] != b["obj"]  # maximal runs: no same-value split
        assert versions[-1]["is_current"]
        assert all(not v["is_current"] for v in versions[:-1])


class TestAllenRelations:
    # one key, intervals engineered to hit all 13 relations vs [10, 20)
    BASE = [("k", "p", 10, 20)]
    OTHERS = [
        ("k", "p", 10, 20, "equal"),
        ("k", "p", 22, 30, "before"),      # e1=20 < s2=22
        ("k", "p", 1, 5, "after"),         # s1=10 > e2=5
        ("k", "p", 20, 25, "meets"),
        ("k", "p", 5, 10, "met_by"),
        ("k", "p", 10, 25, "starts"),
        ("k", "p", 10, 15, "started_by"),
        ("k", "p", 5, 20, "finishes"),
        ("k", "p", 12, 20, "finished_by"),
        ("k", "p", 5, 25, "during"),
        ("k", "p", 12, 18, "contains"),
        ("k", "p", 15, 30, "overlaps"),
        ("k", "p", 5, 15, "overlapped_by"),
    ]

    def test_all_13_relations(self, spark):
        from augmented_codebase_indexer_spark.operators.temporal import (
            allen_relations,
        )

        a = spark.createDataFrame(
            self.BASE, "subj_id string, pred string, valid_from long, valid_to long"
        )
        b = spark.createDataFrame(
            [(k, p, s, e) for k, p, s, e, _ in self.OTHERS],
            "subj_id string, pred string, valid_from long, valid_to long",
        )
        got = {
            (r["s2"], r["e2"]): r["relation"]
            for r in allen_relations(a, b).collect()
        }
        for _, _, s2, e2, want in self.OTHERS:
            assert got[(s2, e2)] == want, (s2, e2, got[(s2, e2)], want)
        # totality: 13 pairs in, 13 classified rows out
        assert len(got) == 13

    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from augmented_codebase_indexer_spark.operators.temporal import (
            allen_relations,
            allen_relations_oracle_sql,
        )

        rows = self.OTHERS
        a_sql = ("SELECT 'k' AS subj_id, 'p' AS pred, 10 AS valid_from, "
                 "20 AS valid_to")
        b_sql = " UNION ALL ".join(
            f"SELECT '{k}' AS subj_id, '{p}' AS pred, {s} AS valid_from, "
            f"{e} AS valid_to" for k, p, s, e, _ in rows
        )
        con = duckdb.connect()
        want = sorted(tuple(r) for r in con.execute(
            allen_relations_oracle_sql(a_sql, b_sql)).fetchall())
        a = spark.createDataFrame(
            self.BASE, "subj_id string, pred string, valid_from long, valid_to long"
        )
        b = spark.createDataFrame(
            [(k, p, s, e) for k, p, s, e, _ in rows],
            "subj_id string, pred string, valid_from long, valid_to long",
        )
        got = sorted(tuple(r) for r in allen_relations(a, b).collect())
        assert got == want

    def test_degenerate_intervals_dropped(self, spark):
        from augmented_codebase_indexer_spark.operators.temporal import (
            allen_relations,
        )

        a = spark.createDataFrame(
            [("k", "p", 10, 10)],  # empty [10, 10) — not an interval
            "subj_id string, pred string, valid_from long, valid_to long",
        )
        b = spark.createDataFrame(
            self.BASE, "subj_id string, pred string, valid_from long, valid_to long"
        )
        assert allen_relations(a, b).count() == 0
