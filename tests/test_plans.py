"""Physical-plan assertions: the optimizations SURVEY.md §4 promises must
actually appear in `.explain` output — pushed filters reach the parquet
scan, small dims broadcast, projections prune columns, and the narrow
pipeline chain contains no exchange."""

import re

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().toString()


SF = "/root/testdata/sf0.001"


def test_filter_pushdown_to_parquet(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select("l_returnflag", "l_quantity")
    plan = _optimized(q)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.select("l_returnflag").distinct()
    plan = _optimized(q)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1).strip() == "l_returnflag:string"


def test_small_dim_broadcasts(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    q = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name").count()
    )
    assert "BroadcastHashJoin" in _plan(q)


def test_pipeline_chain_has_no_exchange(spark, corpus_dir):
    """extract → triples → link is a single narrow stage: the only exchange
    allowed in the executed plan is none at all (gazetteer moves by spark
    broadcast variable, not a join)."""
    from augmented_codebase_indexer_spark.operators.extraction import (
        broadcast_aliases, extract_stage, triple_stage,
    )
    from augmented_codebase_indexer_spark.operators.linking import (
        broadcast_gazetteer, linking_stage,
    )

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    gaz_rows = [r.asDict() for r in spark.read.parquet(f"{corpus_dir}/gazetteer.parquet")
                .select("alias", "ent_id", "canonical_name", "entity_type").collect()]
    alias_bc = broadcast_aliases(spark, [r["alias"] for r in gaz_rows])
    gaz_bc = broadcast_gazetteer(spark, gaz_rows)
    chain = linking_stage(
        triple_stage(
            extract_stage(pages).filter(
                (F.col("lang") == "en") & (F.length("extracted_text") > 0)
            ),
            alias_bc,
        ),
        gaz_bc,
    )
    plan = _plan(chain)
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 3


def test_fat_column_pruned_after_extraction(spark, corpus_dir):
    """html (the fat binary column) must not survive past the extract stage
    in the plan — downstream stages read only url + extracted_text."""
    from augmented_codebase_indexer_spark.operators.extraction import (
        broadcast_aliases, extract_stage, triple_stage,
    )

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    alias_bc = broadcast_aliases(spark, ["Acme"])
    t = triple_stage(extract_stage(pages), alias_bc)
    plan = _plan(t)
    # the second MapInPandas' argument list must not mention html
    second = plan.split("MapInPandas")[1]
    assert "html" not in second


def test_minhash_band_join_shuffles_no_text(spark):
    """The scale fix VERDICT r1 #3 demanded, asserted at the plan level: no
    Exchange in the minhash candidate join may carry the document text —
    only ids, signatures, and band keys move."""
    from augmented_codebase_indexer_spark.operators.dedup import minhash_near_duplicates

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = minhash_near_duplicates(docs, threshold=0.5)
    plan = _plan(q)
    for seg in plan.split("Exchange")[1:]:
        header = seg[:400]  # the exchange's output attribute list
        assert "text#" not in header, header


def test_chunking_is_narrow_no_exchange(spark):
    """Chunking is a per-row flatMap — zero shuffles at any corpus size."""
    from augmented_codebase_indexer_spark.operators.chunking import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(chunk_documents(docs))
    assert "Exchange" not in plan, plan
    # and it's all JVM expressions — no Python stage
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_sketches_are_wholestage_jvm(spark):
    """The SQL-native sketches must run inside WholeStageCodegen with no
    Python evaluation nodes (the round-1 versions were pandas UDFs)."""
    from augmented_codebase_indexer_spark.operators.dedup import (
        with_minhash_signature,
        with_simhash,
    )
    from augmented_codebase_indexer_spark.operators.textstats import with_fingerprint

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for q in (
        with_minhash_signature(docs),
        with_simhash(docs),
        with_fingerprint(docs.select("doc_id", "text")),
    ):
        plan = _plan(q)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan


def test_bucket_partition_pruning(spark, corpus, corpus_dir, tmp_path_factory):
    """Reading edges with a bucket predicate prunes partition directories
    (PartitionFilters in the scan)."""
    from augmented_codebase_indexer_spark.plans.pipeline import build_graph

    wh = str(tmp_path_factory.mktemp("wh_prune"))
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    gaz = spark.read.parquet(f"{corpus_dir}/gazetteer.parquet")
    build_graph(spark, pages, gaz, wh, run_id="prune")
    edges = spark.read.parquet(f"{wh}/edges")
    q = edges.filter((F.col("bucket") == 3) & (F.col("subj_id") == "x"))
    plan = _optimized(q)
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:120]
    assert "bucket" in seg


def test_join_mention_path_shuffles_no_text(spark, corpus_dir):
    """The huge-gazetteer mention tier (operators/mentions_joins.py): no
    Exchange feeding the candidates ⋈ alias join may carry the document
    text — only slim (url, offsets, surface) rows and the alias table move.
    The text crosses exactly one exchange: the cogroup with the selected
    spans (asserted by counting text-carrying exchanges, not just their
    absence)."""
    from augmented_codebase_indexer_spark.operators.extraction import extract_stage
    from augmented_codebase_indexer_spark.operators.mentions_joins import (
        triple_stage_joins,
    )

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    gaz = spark.read.parquet(f"{corpus_dir}/gazetteer.parquet")
    extracted = extract_stage(pages).filter(
        (F.col("lang") == "en") & (F.length("extracted_text") > 0)
    )
    plan = _plan(triple_stage_joins(extracted, gaz))
    text_exchanges = 0
    for seg in plan.split("Exchange")[1:]:
        header = seg[:400]  # the exchange's output attribute list
        if "extracted_text#" in header:
            text_exchanges += 1
    # one text exchange (the cogroup-by-url of the text side), never more —
    # in particular the exploded n-gram candidate side carries no text
    assert text_exchanges == 1, plan


def test_anchor_profile_html_never_shuffles(spark):
    """Anchor profiles (r5): the html payload is consumed by the codegen
    extraction scan; every exchange downstream carries only (href, tok,
    count) rows — and there is no Python stage anywhere."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["anchor_profile"](spark, SF))
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    for seg in plan.split("Exchange")[1:]:
        assert "html#" not in seg[:400], seg[:400]


def test_redirect_doubling_exchanges_are_slim(spark):
    """Pointer doubling (r5): each round's self-join exchanges only the
    fixed-width (src, nxt, hops) pointer rows; no Python, no cartesian."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["redirect_resolve"](spark, SF))
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_comention_pmi_plan_is_jvm_aggregates(spark):
    """Co-mention PMI (r5): pair/marginal counting must be algebraic
    JVM aggregates (partial_count before every exchange), with no
    Python stage and no cartesian pair generation."""
    import __spark_entry__ as E

    plan = _plan(E.queries()["comention_pmi"](spark, SF))
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "partial_count" in plan, plan


def test_paradedup_vote_exchange_carries_no_text(spark):
    """Paragraph dedup's first-occurrence vote groups by md5(para): the
    vote exchange must carry (hash, partial min-struct) only — paragraph
    TEXT may ride exactly one exchange (the keep-join), never the vote."""
    from augmented_codebase_indexer_spark.operators.paradedup import (
        paragraph_dedup, split_paragraphs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id", "replace(text, ' value ', chr(10) || chr(10)) AS text"
    )
    q = paragraph_dedup(split_paragraphs(docs))
    plan = _plan(q)
    # what an exchange SHIPS is its child's output attribute list (the
    # first `output=[...]` in the segment); paragraph text may appear in
    # at most one of them (the keep-join), and never in the md5 vote
    # (whose partial-agg output is (h, min-struct) / the reassembly's
    # collect_list buffer hides behind `buf#`)
    carrying = []
    for seg in plan.split("Exchange")[1:]:
        m = re.search(r"output=\[([^\]]*)\]", seg)
        if m and "para#" in m.group(1):
            carrying.append(m.group(1))
    assert len(carrying) <= 1, carrying


def test_lpa_argmax_has_no_window(spark):
    """LPA's per-round argmax is min(struct(-cnt, lbl)) — a combinable
    aggregate, not a per-node window (no hot partition on celebrities)."""
    from augmented_codebase_indexer_spark.operators.communities import (
        lpa_communities,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    e = docs.selectExpr(
        "CAST(doc_id % 151 AS STRING) AS src",
        "CAST((doc_id * 13 + 5) % 151 AS STRING) AS dst",
    )
    plan = _plan(lpa_communities(e, rounds=3))
    assert "Window" not in plan


def test_bgp_plans_no_cartesian(spark):
    """A connected BGP compiles to hash joins only — never a cartesian
    or broadcast nested loop."""
    from augmented_codebase_indexer_spark.operators.bgp import bgp_match

    t = spark.createDataFrame(
        [("a", "works_at", "x"), ("a", "born_in", "y")],
        "subj string, pred string, obj string",
    )
    plan = _plan(bgp_match(
        t, [("?p", "works_at", "?o"), ("?p", "born_in", "?c")]))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bursts_plan_has_no_window(spark):
    """Burst detection is pure groupBys + a 1-row broadcast: no window,
    and the day-count side arrives as a broadcast exchange."""
    from augmented_codebase_indexer_spark.operators.bursts import daily_bursts

    events = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(daily_bursts(events))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan
