"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: run the full KG extraction pipeline (extract →
mention → pattern-OpenIE triples → broadcast-LSH entity linking) over pages
deterministically derived from ``documents`` at sf0.001 and return the edge
DataFrame.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator family
(SURVEY.md §2). The KG queries run the REAL pipeline UDFs over derived pages
whose planted facts are closed-form doc_id arithmetic, so an independent
DuckDB oracle reconstructs the expected output without running any of our
code.

Sketch operators (minhash, simhash, fingerprint, sign-LSH) are defined in
engine-portable SQL (``functions/sqlhash.py``) — DuckDB evaluates the SAME
integer/md5 arithmetic bit-identically, so they get exact oracles too
(round-1 ran them as Python UDFs with rows-only checks; VERDICT r1 #2).
The two genuinely non-SQL queries read frozen fixtures produced by
independent pure-Python/numpy implementations (``scripts/make_fixtures.py``,
keyed to sf0.01, the driver's correctness scale): ``pagerank`` (numpy over
the same closed-form outlink graph) and ``hybrid_search``'s vector branch
(SHA-256 hash embeddings). Every other stage of those two queries is live
SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# shared builders
# ---------------------------------------------------------------------------


def _kg_linked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived pages → extract → triples → linking (the pipeline spine)."""
    from augmented_codebase_indexer_spark.operators.extraction import (
        broadcast_aliases,
        extract_stage,
        triple_stage,
    )
    from augmented_codebase_indexer_spark.operators.linking import (
        broadcast_gazetteer,
        linking_stage,
    )
    from augmented_codebase_indexer_spark.sources.pages import (
        derive_pages_from_documents,
        entry_gazetteer_rows,
    )

    pages = derive_pages_from_documents(spark, sf_dir)
    gaz_rows = entry_gazetteer_rows(50)
    alias_bc = broadcast_aliases(spark, [r["alias"] for r in gaz_rows])
    gaz_bc = broadcast_gazetteer(spark, gaz_rows)
    # lang filter BEFORE extraction: Catalyst can't push a predicate through
    # the (opaque) mapInPandas stage, so apply it at the scan — non-allowed
    # languages never pay the Python extraction cost (output-equivalent:
    # the old post-extract filter dropped the same rows later)
    extracted = extract_stage(pages.filter(F.col("lang") == "en")).filter(
        F.length("extracted_text") > 0
    )
    return linking_stage(triple_stage(extracted, alias_bc), gaz_bc)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    linked = _kg_linked(spark, SF001)
    return (
        linked.filter(F.col("resolved"))
        .select("subj_id", "pred", "obj_id", "url")
        .distinct()
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_kg_extract_text(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.extraction import extract_stage
    from augmented_codebase_indexer_spark.sources.pages import derive_pages_from_documents

    pages = derive_pages_from_documents(spark, sf_dir)
    return extract_stage(pages).select("url", "extracted_text")


def q_kg_triples(spark, sf_dir):
    return (
        _kg_linked(spark, sf_dir)
        .filter(F.col("resolved"))
        .select("subj_id", "pred", "obj_id", "url")
        .distinct()
    )


def q_kg_mentions(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.extraction import (
        broadcast_aliases,
        extract_stage,
        mention_stage,
    )
    from augmented_codebase_indexer_spark.sources.pages import (
        derive_pages_from_documents,
        entry_gazetteer_rows,
    )

    pages = derive_pages_from_documents(spark, sf_dir)
    alias_bc = broadcast_aliases(spark, [r["alias"] for r in entry_gazetteer_rows(50)])
    extracted = extract_stage(pages.filter(F.col("lang") == "en")).filter(
        F.length("extracted_text") > 0
    )
    return (
        mention_stage(extracted, alias_bc)
        .groupBy("url")
        .agg(F.count("*").alias("n_mentions"))
    )


def q_kg_mentions_joins(spark, sf_dir):
    """Same result as kg_mentions through the NO-MATERIALIZATION tier:
    token-ngram candidates equi-join the gazetteer TABLE
    (operators/mentions_joins.py) — no alias ROWS are ever collected or
    broadcast; only the vocab-bounded set of distinct alias FIRST tokens
    ships (size-guarded) to prune candidate starts ~12×. Gated against
    the SAME independent DuckDB oracle, so the driver verifies the
    huge-gazetteer path end-to-end, not just pytest."""
    from augmented_codebase_indexer_spark.operators.extraction import extract_stage
    from augmented_codebase_indexer_spark.operators.mentions_joins import (
        mention_stage_joins,
    )
    from augmented_codebase_indexer_spark.sources.pages import (
        derive_pages_from_documents,
        entry_gazetteer_rows,
    )

    pages = derive_pages_from_documents(spark, sf_dir)
    gaz = spark.createDataFrame(entry_gazetteer_rows(50))
    extracted = extract_stage(pages.filter(F.col("lang") == "en")).filter(
        F.length("extracted_text") > 0
    )
    return (
        mention_stage_joins(extracted, gaz)
        .groupBy("url")
        .agg(F.count("*").alias("n_mentions"))
    )


def q_kg_node_degree(spark, sf_dir):
    linked = _kg_linked(spark, sf_dir).filter(F.col("resolved"))
    endpoints = linked.select(F.col("subj_id").alias("node_id")).unionByName(
        linked.select(F.col("obj_id").alias("node_id"))
    )
    return endpoints.groupBy("node_id").agg(F.count("*").alias("mention_count"))


def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity").cast("double"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_join_topk_revenue(spark, sf_dir):
    li, o, c, n = (_t(spark, sf_dir, t) for t in ("lineitem", "orders", "customer", "nation"))
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
        .limit(5)
    )
    return rev


def q_incremental_diff(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.incremental import diff_snapshots

    o = _t(spark, sf_dir, "orders")
    current = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").cast("string").alias("url"),
        F.sha2(
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1)
            .otherwise(F.col("o_totalprice")).cast("string"),
            256,
        ).alias("content_hash"),
    )
    indexed = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").cast("string").alias("url"),
        F.sha2(F.col("o_totalprice").cast("string"), 256).alias("content_hash"),
    )
    return diff_snapshots(current, indexed).groupBy("change").agg(
        F.count("*").alias("n")
    )


def q_interval_antijoin(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    errs = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("u"), F.col("value").alias("lo"),
        (F.col("value") + 10).alias("hi"),
    )
    keep = e.filter(F.col("event_type") != "error").join(
        errs,
        (F.col("user_id") == F.col("u")) & (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")),
        "left_anti",
    )
    return keep.groupBy("event_type").agg(F.count("*").alias("n"))


def q_window_dedup(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


def q_rrf_fuse(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.rrf import rank_by, rrf_fuse

    d = _t(spark, sf_dir, "documents")
    a = rank_by(d.select("doc_id", F.col("n_chars").alias("s")), "doc_id", "s", "chars")
    b = rank_by(
        d.select("doc_id", ((F.col("doc_id") * 37) % 101).alias("s")),
        "doc_id", "s", "mod",
    )
    return rrf_fuse([a, b], limit=20)


def q_percentiles(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
    )


def q_lang_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


def q_distinct_sources(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(F.countDistinct("source").alias("n_sources"))


def q_topk_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.orderBy(F.desc("n_chars"), F.asc("doc_id")).select("doc_id", "n_chars").limit(10)


def q_set_ops(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    errors = (
        e.filter((F.col("event_type") == "error") & (F.col("value") > 150))
        .select("user_id").distinct()
    )
    return clicks.exceptAll(errors).distinct()


def q_group_collect(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources")
    )


def q_sha_hash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.sha2(F.col("text"), 256).alias("content_hash"))


def q_dedup_exact(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.dedup import exact_duplicate_groups

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    groups = exact_duplicate_groups(d.unionByName(dup))
    return groups.select(
        "content_hash", "dup_count",
        F.array_join(F.transform("doc_ids", lambda x: x.cast("string")), ",").alias("ids"),
    )


def q_dedup_ngram(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.dedup import ngram_jaccard_pairs

    # the GATED form carries the scale guard (max_df pruning) — the uncapped
    # variant is quadratic on boilerplate vocabulary (VERDICT r1 #4) and
    # remains a pytest-only exactness case
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, threshold=0.8, n=1, max_df=50)


def q_dedup_minhash(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.dedup import minhash_near_duplicates

    return minhash_near_duplicates(
        _t(spark, sf_dir, "documents"), threshold=0.5, max_bucket_size=200
    )


def q_near_dedup_winners(spark, sf_dir):
    # cluster-level near-dedup: minhash pairs → connected components →
    # min-id winner per cluster (near-dup is not transitive, so keep-one
    # must be decided per component, not per pair)
    from augmented_codebase_indexer_spark.operators.dedup import near_dedup_winners

    return near_dedup_winners(
        _t(spark, sf_dir, "documents"), threshold=0.5, max_bucket_size=200
    )


def q_cluster_cap(spark, sf_dir):
    # soft dedup: at most k members per near-dup CLUSTER (cap-k instead
    # of keep-one) — keeps bounded natural variation of templated pages
    # for the training mix; composition of the cluster labeling with the
    # per-domain quota machinery (cluster_id as the quota key)
    from augmented_codebase_indexer_spark.operators.dedup import near_dedup_winners
    from augmented_codebase_indexer_spark.operators.sampling import domain_cap

    labels = near_dedup_winners(
        _t(spark, sf_dir, "documents"), threshold=0.5, max_bucket_size=200
    )
    return domain_cap(
        labels.select("doc_id", "cluster_id"), k=2, domain_col="cluster_id"
    ).select(
        "doc_id", "cluster_id", F.col("domain_rank").alias("cluster_rank")
    )


def q_dedup_simhash(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.dedup import simhash_near_duplicates

    return simhash_near_duplicates(_t(spark, sf_dir, "documents"), max_hamming=10)


def q_dedup_embedding(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.ann import embedding_near_duplicates

    return embedding_near_duplicates(_t(spark, sf_dir, "embeddings"), threshold=0.5)


def q_dedup_embedding_lsh(spark, sf_dir):
    # LSH-bucketed scale path: deterministic sign-bit signatures + exact
    # verify → the DuckDB oracle replays the same buckets exactly
    from augmented_codebase_indexer_spark.operators.ann import (
        embedding_near_duplicates_lsh,
    )

    return embedding_near_duplicates_lsh(_t(spark, sf_dir, "embeddings"), threshold=0.5)


def q_ann_topk(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.ann import brute_force_topk

    return brute_force_topk(_t(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=3)


def q_ann_lsh(spark, sf_dir):
    # approximate by design but deterministic → exact SQL mirror
    from augmented_codebase_indexer_spark.operators.ann import lsh_bucket_topk

    return lsh_bucket_topk(_t(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=3)


def q_text_stats(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.textstats import with_text_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return with_text_stats(d).select(
        "doc_id", "n_tokens_ws", "n_tokens_re", "n_chars_out",
        "quality_micro", "lang_pred"
    )


def q_fingerprint(spark, sf_dir):
    # rolling-hash sketch, JVM expressions — DuckDB evaluates the same
    # polynomial bit-identically (functions/sqlhash.py)
    from augmented_codebase_indexer_spark.operators.textstats import with_fingerprint

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return with_fingerprint(d).select(
        "doc_id", F.array_join(F.transform("fingerprint", lambda x: x.cast("string")), ",").alias("fp")
    )


def q_event_window(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
    )


def q_traverse(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.traversal import neighborhood

    e = _t(spark, sf_dir, "events")
    edges = e.select(
        F.col("user_id").cast("string").alias("subj_id"),
        ((F.col("user_id") * 3 + 7) % 50).cast("string").alias("obj_id"),
    ).distinct()
    return neighborhood(edges, ["1"], depth=3, direction="out")


def q_topo_layers(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.traversal import topological_layers

    e = _t(spark, sf_dir, "events")
    edges = e.select(
        F.col("user_id").cast("string").alias("src"),
        (F.col("user_id") * 2 + 1 + F.col("event_id") % 2).cast("string").alias("dst"),
    ).filter((F.col("user_id") * 2 + 1 + F.col("event_id") % 2) < 200).distinct()
    nodes = edges.select(F.col("src").alias("node_id")).unionByName(
        edges.select(F.col("dst").alias("node_id"))
    ).distinct()
    return topological_layers(edges, nodes)


def q_mrr(spark, sf_dir):
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = d.withColumn("rank", F.row_number().over(w))
    rel = ranked.filter(F.col("doc_id") % 3 == 0)
    return rel.groupBy("lang").agg(
        F.round(1.0 / F.min("rank"), 6).alias("rr")
    )


def q_score_normalize(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    return e.select(
        "event_id",
        F.round(F.col("value") / F.max("value").over(w), 6).alias("norm"),
    )


def q_outer_join_histogram(spark, sf_dir):
    """Q13-style: distribution of customers by order count, zeros included
    (left outer join + two-level aggregation)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


def q_having_filter(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .filter(F.col("n") >= 20)
    )


def q_cube_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.cube("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .select(
            F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
            "n_docs", "total_chars",
        )
    )


def q_semi_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big_orders = o.filter(F.col("o_totalprice") > 400000).select("o_custkey").distinct()
    return (
        c.join(big_orders, c.c_custkey == big_orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def q_pattern_search(spark, sf_dir):
    from augmented_codebase_indexer_spark.plans.search import pattern_candidates

    d = _t(spark, sf_dir, "documents")
    return pattern_candidates(d, "spark window join").select(
        "item_id", F.round("score", 6).alias("score")
    )


def q_hybrid_search(spark, sf_dir):
    # oracle: SQL mirror of both branches; the hash-embedded corpus side is
    # a frozen pure-Python fixture (scripts/make_fixtures.py, sf0.01)
    from augmented_codebase_indexer_spark.plans.search import hybrid_search

    d = _t(spark, sf_dir, "documents")
    return hybrid_search(d, "spark window join", k=10)


def q_pagerank(spark, sf_dir):
    # PageRank over the REAL extracted link graph (C8 outlinks), not a
    # synthetic modular-arithmetic graph; oracle = frozen numpy fixture over
    # the same closed-form edge set (scripts/make_fixtures.py, sf0.01)
    from augmented_codebase_indexer_spark.functions.textextract import outlink_edges
    from augmented_codebase_indexer_spark.operators.pagerank import pagerank
    from augmented_codebase_indexer_spark.sources.pages import derive_pages_from_documents

    pages = derive_pages_from_documents(spark, sf_dir)
    edges = outlink_edges(pages)
    # local_threshold=0 pins the DISTRIBUTED tier: the driver gate must
    # exercise the iterative DataFrame loop, not the local solver the
    # fixture itself was generated with
    pr = pagerank(edges, max_iters=30, src_col="src_url", dst_col="href",
                  local_threshold=0)
    return pr.select("node_id", F.round("pagerank", 6).alias("pagerank"))


def q_ppr(spark, sf_dir):
    # personalized PageRank: teleport restricted to the first three
    # source pages — rank mass concentrates in their neighborhoods (the
    # seed-conditional context ranker). Distributed tier pinned; oracle =
    # frozen numpy fixture with the identical seed choice.
    from augmented_codebase_indexer_spark.functions.textextract import outlink_edges
    from augmented_codebase_indexer_spark.operators.pagerank import (
        personalized_pagerank,
    )
    from augmented_codebase_indexer_spark.sources.pages import derive_pages_from_documents

    pages = derive_pages_from_documents(spark, sf_dir)
    seeds = [
        f"https://docs.example/{r['source']}/{r['doc_id']}"
        for r in _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") <= 2)
        .select("doc_id", "source")
        .collect()
    ]
    pr = personalized_pagerank(
        outlink_edges(pages), seeds, max_iters=30,
        src_col="src_url", dst_col="href", local_threshold=0,
    )
    return pr.select("node_id", F.round("pagerank", 6).alias("pagerank"))


def q_chunking(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.chunking import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"), size=40, overlap=10)


def q_chunking_sentence(spark, sf_dir):
    """Smart-splitter parity: cut points snap to the nearest sentence
    boundary within ±tol tokens (operators/chunking.py:chunk_documents_sentence;
    reference core/chunker/smart_splitter.py:59-339). The synthetic
    documents table has NO sentence punctuation, so the gate first injects
    a deterministic '.' after every 9th token — identically in the DuckDB
    oracle — which makes every nominal cut actually snap (offset-3
    boundaries at all multiples of 30); fixed-stride degeneration would
    hash-mismatch."""
    from augmented_codebase_indexer_spark.operators.chunking import (
        chunk_documents_sentence,
    )

    docs = _t(spark, sf_dir, "documents")
    punct = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t, j: F.when(j % 9 == 8, F.concat(t, F.lit("."))).otherwise(t),
            ),
            " ",
        ).alias("text"),
    )
    return chunk_documents_sentence(punct, size=40, overlap=10, tol=5)


def q_boilerplate_prune(spark, sf_dir):
    """Cross-document segment dedup (RefinedWeb-style line-level dedup):
    segments appearing in ≥ min_df docs removed everywhere
    (operators/curation_filters.py)."""
    from augmented_codebase_indexer_spark.operators.curation_filters import (
        boilerplate_prune,
    )

    return boilerplate_prune(_t(spark, sf_dir, "documents"), min_df=3)


def q_repetition_stats(spark, sf_dir):
    """Within-document duplicate n-gram fractions (Gopher repetition rules),
    zero-shuffle array algebra (operators/curation_filters.py)."""
    from augmented_codebase_indexer_spark.operators.curation_filters import (
        repetition_stats,
    )

    return repetition_stats(_t(spark, sf_dir, "documents"))


def q_summaries(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.summary import summarize_documents

    return summarize_documents(_t(spark, sf_dir, "documents"))


def q_outlinks(spark, sf_dir):
    from augmented_codebase_indexer_spark.functions.textextract import outlink_edges
    from augmented_codebase_indexer_spark.sources.pages import derive_pages_from_documents

    return outlink_edges(derive_pages_from_documents(spark, sf_dir))


def q_anchor_profile(spark, sf_dir):
    """Top-k anchor terms per link target (operators/anchors.py): the
    link-based naming signal — candidate aliases for the gazetteer tier.
    Oracle reconstructs the three nav anchors per derived page closed-form."""
    from augmented_codebase_indexer_spark.operators.anchors import (
        anchor_profile,
        anchor_texts,
    )
    from augmented_codebase_indexer_spark.sources.pages import derive_pages_from_documents

    return anchor_profile(anchor_texts(derive_pages_from_documents(spark, sf_dir)), k=3)


def q_redirect_resolve(spark, sf_dir):
    """Redirect-chain resolution by pointer doubling (operators/redirects.py):
    O(log L) slim self-joins instead of L sequential hops. Edge relation is
    closed-form doc_id arithmetic — chains of 5 urls per doc-id bucket
    (d → d-1 within each [5k, 5k+5) bucket), every 500th bucket closed into
    a loop (bucket start → start+4) so the cycle verdict is exercised on
    driver data, not just in pytest."""
    from augmented_codebase_indexer_spark.operators.redirects import resolve_redirects

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://docs.example/"), F.col("source"), F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    hop = (
        d.alias("a")
        .join(d.alias("b"), F.expr("b.doc_id = a.doc_id - 1"))
        .where(F.expr("a.doc_id % 5 <> 0"))
        .select(F.col("a.url").alias("src"), F.col("b.url").alias("dst"))
    )
    closer = (
        d.alias("a")
        .join(d.alias("b"), F.expr("b.doc_id = a.doc_id + 4"))
        .where(F.expr("a.doc_id % 500 = 0"))
        .select(F.col("a.url").alias("src"), F.col("b.url").alias("dst"))
    )
    return resolve_redirects(hop.unionByName(closer))


def q_comention_pmi(spark, sf_dir):
    """Entity co-mention PMI (operators/comention.py): association strength
    per co-mentioned pair as an exact BIGINT micro-ratio (monotone in PMI).
    Mentions are the planted (subj, obj) per derived page — closed-form, so
    the oracle reconstructs every count without running our extraction."""
    from augmented_codebase_indexer_spark.operators.comention import comention_pmi

    d = _t(spark, sf_dir, "documents")
    subj = F.concat(F.lit("Entity"), (F.col("doc_id") % 50).cast("string"))
    obj = F.concat(
        F.lit("Entity"), ((F.col("doc_id") * 7 + 13) % 50).cast("string")
    )
    m = d.select(F.col("doc_id"), subj.alias("ent_id")).unionByName(
        d.select(F.col("doc_id"), obj.alias("ent_id"))
    )
    return comention_pmi(m, max_entities_per_doc=None)


def q_phrase_search(spark, sf_dir):
    """Exact consecutive-token phrase matching (operators/phrase.py):
    counts + first position per doc, zero-shuffle array algebra."""
    from augmented_codebase_indexer_spark.operators.phrase import phrase_match

    return phrase_match(_t(spark, sf_dir, "documents"), "table scan")


def q_dedup_containment(spark, sf_dir):
    """Directed n-gram containment (quote/inclusion detection): the
    syndication case symmetric Jaccard misses. Same max_df scale guard
    as dedup_ngram; exact BIGINT micro gate."""
    from augmented_codebase_indexer_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    return ngram_containment_pairs(d, threshold=0.9, n=1, max_df=50)


def q_crawl_frontier(spark, sf_dir):
    """Composed crawl-frontier chain (operators/frontier.py): canonicalize
    (collapsing a tracking/port variant per doc) → robots-allowed per RFC
    9309 → per-host quota + politeness slots (WindowGroupLimit-planned)."""
    from augmented_codebase_indexer_spark.operators.frontier import crawl_frontier
    from augmented_codebase_indexer_spark.operators.robots import parse_robots

    d = _t(spark, sf_dir, "documents").select("doc_id")
    site = (F.col("doc_id") % 7).cast("string")
    sid = F.col("doc_id").cast("string")
    cands = d.select(
        F.concat(F.lit("https://site"), site, F.lit(".example.com/p/"), sid)
        .alias("url")
    ).unionByName(
        d.select(
            F.concat(
                F.lit("HTTPS://SITE"), site, F.lit(".EXAMPLE.COM:443/p/"),
                sid, F.lit("?utm_source=feed"),
            ).alias("url")
        )
    )
    doms = d.select((F.col("doc_id") % 7).alias("dnum")).distinct()
    robots = doms.select(
        F.concat(F.lit("site"), F.col("dnum").cast("string"),
                 F.lit(".example.com")).alias("domain"),
        F.when(F.col("dnum") % 2 == 0, F.lit(_ROBOTS_STAR + _ROBOTS_BOT))
        .otherwise(F.lit(_ROBOTS_STAR)).alias("robots_txt"),
    )
    return crawl_frontier(
        cands, parse_robots(robots), agent="aci-bot", per_host_cap=60
    )


def q_kg_volatility(spark, sf_dir):
    """Per-predicate churn profile from SCD2 intervals (operators/
    temporal.py): versions-per-key and mean closed-version duration as
    exact BIGINTs — the recrawl-cadence / retention diagnostic."""
    from augmented_codebase_indexer_spark.operators.temporal import (
        predicate_volatility,
        scd2_intervals,
    )

    return predicate_volatility(scd2_intervals(_temporal_facts(spark, sf_dir)))


def q_graph_reciprocity(spark, sf_dir):
    """Per-node edge reciprocity on the directed entity graph (operators/
    graphalgs.py): mutual-link share as exact BIGINT micro."""
    from augmented_codebase_indexer_spark.operators.graphalgs import reciprocity

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return reciprocity(spark.sql(_entity_graph_sql("spark")))


def q_jsonld_items(spark, sf_dir):
    """Schema.org JSON-LD extraction (operators/structured.py): publisher-
    written structured markup — the highest-precision web-KG source.
    Pages synthesized closed-form: every doc carries an Organization
    block; every 5th adds a Person block; every 10th+3 a MALFORMED block
    that must surface as NULLs, never drop."""
    from augmented_codebase_indexer_spark.operators.structured import (
        extract_jsonld,
        jsonld_items,
    )

    d = _t(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 50).cast("string")
    org = F.concat(
        F.lit('{"@type":"Organization","name":"Entity'), k,
        F.lit('","url":"https://docs.example/e/'), k, F.lit('"}'),
    )
    person = F.concat(
        F.lit('{"@type":"Person","name":"Author '),
        (F.col("doc_id") % 20).cast("string"), F.lit('"}'),
    )
    bad = F.lit('{"@type":"Organization","name":')
    tag = '<script type="application/ld+json">'
    html_str = F.concat(
        F.lit("<html><body><p>x</p>" + tag), org, F.lit("</script>"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit(tag), person, F.lit("</script>"))
               ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 10 == 3,
               F.concat(F.lit(tag), bad, F.lit("</script>"))
               ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = d.select(
        F.concat(F.lit("https://docs.example/"), F.col("source"),
                 F.lit("/"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(html_str, "UTF-8").alias("html"),
    )
    return jsonld_items(extract_jsonld(pages))


def q_web_tables(spark, sf_dir):
    """WebTables relation recovery (operators/webtables.py): header→value
    pairs from HTML tables, three codegen explode levels + one slim join.
    Tables synthesized closed-form: 2-col header + one data row per doc,
    every 3rd doc a second row."""
    from augmented_codebase_indexer_spark.operators.webtables import (
        extract_table_cells,
        table_relations,
    )

    d = _t(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 50).cast("string")
    obj = ((F.col("doc_id") * 7 + 13) % 50).cast("string")
    m = (F.col("doc_id") % 6).cast("string")
    html_str = F.concat(
        F.lit('<html><table class="facts"><tr><th>name</th><th>role</th></tr>'
              "<tr><td>Entity"), k, F.lit("</td><td>R"), m,
        F.lit("</td></tr>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("<tr><td>Entity"), obj,
                     F.lit("</td><td>partner</td></tr>")),
        ).otherwise(F.lit("")),
        F.lit("</table></html>"),
    )
    pages = d.select(
        F.concat(F.lit("https://docs.example/"), F.col("source"),
                 F.lit("/"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(html_str, "UTF-8").alias("html"),
    )
    return table_relations(extract_table_cells(pages))


def q_sitemap_recrawl(spark, sf_dir):
    """Sitemap changed-since recrawl selection (operators/sitemaps.py):
    parse per-domain sitemap XML (assembled closed-form, one <url> block
    per doc with a lastmod date from doc_id arithmetic), diff against a
    synthesized fetch log — never-fetched urls are 'new', stale ones
    'modified', fresh ones skipped. The oracle reconstructs entries and
    log with pure integer epoch arithmetic (UTC session timezone)."""
    from augmented_codebase_indexer_spark.operators.sitemaps import (
        parse_sitemap,
        recrawl_candidates,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    site = (F.col("doc_id") % 7).cast("string")
    url = F.concat(F.lit("https://site"), site, F.lit(".example.com/p/"),
                   F.col("doc_id").cast("string"))
    day = F.lpad((F.col("doc_id") % 27 + 1).cast("string"), 2, "0")
    block = F.concat(
        F.lit("<url><loc>"), url, F.lit("</loc><lastmod>2026-01-"), day,
        F.lit("</lastmod></url>"),
    )
    sitemaps = (
        d.select(F.concat(F.lit("site"), site, F.lit(".example.com"))
                 .alias("domain"), block.alias("block"))
        .groupBy("domain")
        .agg(F.concat_ws("", F.sort_array(F.collect_list("block"))).alias("xml"))
        .select("domain", F.concat(F.lit("<urlset>"), F.col("xml"),
                                   F.lit("</urlset>")).alias("xml"))
    )
    log = d.filter(F.col("doc_id") % 2 == 0).select(
        url.alias("url"),
        (F.lit(1767225600) + (F.col("doc_id") % 31) * 86400 + 3600)
        .cast("long").alias("fetched_at"),
    )
    return recrawl_candidates(parse_sitemap(sitemaps), log)


def q_kg_multisource(spark, sf_dir):
    """The multi-source KG merge: triples from all four extraction
    families — pattern OpenIE (the planted relation facts), LIVE Hearst
    regex extraction, LIVE JSON-LD extraction, LIVE web-table relation
    recovery — unioned with provenance and aggregated per fact:
    (subj, pred, obj, n_obs, srcs). The oracle reconstructs every
    family closed-form (Hearst/JSON-LD/web-table plants are doc_id
    arithmetic), so three real extraction chains are cross-checked
    inside ONE composed gate."""
    openie = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("Entity"), (F.col("doc_id") % 50).cast("string"))
        .alias("subj"),
        F.expr(
            "CASE doc_id % 6 WHEN 0 THEN 'acquired' WHEN 1 THEN 'founded_by' "
            "WHEN 2 THEN 'located_in' WHEN 3 THEN 'partnered_with' "
            "WHEN 4 THEN 'subsidiary_of' ELSE 'works_for' END"
        ).alias("pred"),
        F.concat(F.lit("Entity"),
                 ((F.col("doc_id") * 7 + 13) % 50).cast("string")).alias("obj"),
        F.lit("openie").alias("src"),
    )
    hearst = q_hearst_isa(spark, sf_dir).select(
        F.col("hypo").alias("subj"), "pred", F.col("hyper").alias("obj"),
        F.lit("hearst").alias("src"),
    )
    jsonld = (
        q_jsonld_items(spark, sf_dir)
        .filter(F.col("name").isNotNull() & F.col("item_type").isNotNull())
        .select(
            F.col("name").alias("subj"),
            F.lit("instance_of").alias("pred"),
            F.col("item_type").alias("obj"),
            F.lit("jsonld").alias("src"),
        )
    )
    wt = q_web_tables(spark, sf_dir)
    names = wt.filter(F.col("header") == "name").select(
        "url", "table_idx", "row_idx", F.col("value").alias("subj")
    )
    webtable = (
        wt.filter(F.col("header") != "name")
        .join(names, ["url", "table_idx", "row_idx"])
        .select("subj", F.col("header").alias("pred"),
                F.col("value").alias("obj"), F.lit("webtable").alias("src"))
    )
    # seed-KB priors overlap the JSON-LD type assertions on purpose, so
    # the provenance merge (srcs='jsonld,kb') is exercised in the gate
    kb = (
        _t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 50).alias("k")).distinct()
        .select(
            F.concat(F.lit("Entity"), F.col("k").cast("string")).alias("subj"),
            F.lit("instance_of").alias("pred"),
            F.lit("Organization").alias("obj"),
            F.lit("kb").alias("src"),
        )
    )
    return (
        openie.unionByName(hearst).unionByName(jsonld).unionByName(webtable)
        .unionByName(kb)
        .groupBy("subj", "pred", "obj")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.array_join(F.array_sort(F.collect_set("src")), ",").alias("srcs"),
        )
    )


def q_crawl_novelty(spark, sf_dir):
    """Crawl-increment novelty (operators/dedup.py::gram_novelty): per new
    doc (every 10th, the 'increment'), the exact share of distinct grams
    the rest of the corpus has never seen — the crawl-yield metric."""
    from augmented_codebase_indexer_spark.operators.dedup import gram_novelty

    d = _t(spark, sf_dir, "documents")
    return gram_novelty(
        d.filter(F.col("doc_id") % 10 == 7),
        d.filter(F.col("doc_id") % 10 != 7),
    )


def q_hll_vocab(spark, sf_dir):
    """HyperLogLog register table over the corpus vocabulary (operators/
    hll.py): the mergeable distinct-counting sketch — the gate hashes the
    exact integer registers, the float estimate stays display-path."""
    from augmented_codebase_indexer_spark.operators.hll import hll_registers

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("value"))
        .filter(F.col("value") != "")
    )
    return hll_registers(toks)


def q_tfidf_keywords(spark, sf_dir):
    """Top-k tf·idf terms per document (operators/keywords.py): ONE
    quantized float (idf_micro, tie-distance-audited), exact BIGINT
    scores downstream, WindowGroupLimit-planned top-k."""
    from augmented_codebase_indexer_spark.operators.keywords import tfidf_keywords

    return tfidf_keywords(_t(spark, sf_dir, "documents"), k=3)


def q_feed_items(spark, sf_dir):
    """RSS feed parsing (operators/feeds.py): per-domain feeds assembled
    closed-form (one item per doc, RFC-1123 pubDate from doc_id day
    arithmetic), parsed back to (link, title, epoch). The oracle
    reconstructs items without parsing xml; item order inside a feed is
    the lexical block order == string order of doc_id."""
    from augmented_codebase_indexer_spark.operators.feeds import parse_feed

    d = _t(spark, sf_dir, "documents").select("doc_id")
    site = (F.col("doc_id") % 7).cast("string")
    sid = F.col("doc_id").cast("string")
    url = F.concat(F.lit("https://site"), site, F.lit(".example.com/p/"), sid)
    day = F.lpad((F.col("doc_id") % 27 + 1).cast("string"), 2, "0")
    block = F.concat(
        F.lit("<item><title>Doc "), sid, F.lit("</title><link>"), url,
        F.lit("</link><pubDate>Fri, "), day,
        F.lit(" Jan 2026 08:30:00 GMT</pubDate></item>"),
    )
    feeds = (
        d.select(F.concat(F.lit("site"), site, F.lit(".example.com"))
                 .alias("feed_url"), block.alias("block"))
        .groupBy("feed_url")
        .agg(F.concat_ws("", F.sort_array(F.collect_list("block"))).alias("xml"))
    )
    return parse_feed(feeds)


def q_dedup_ngram_prefix(spark, sf_dir):
    """PPJoin prefix-filtered exact Jaccard (operators/dedup.py): the
    candidate join runs over rarest-first prefixes instead of every
    gram — identical output to dedup_ngram by construction, so the
    oracle IS the plain tier's SQL."""
    from augmented_codebase_indexer_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs_prefix(d, threshold=0.8, max_df=50)


def q_cm_sketch(spark, sf_dir):
    """Count-Min register table over corpus tokens (operators/hll.py):
    the sum-mergeable frequency sketch — exact integer gate, estimates
    display-path."""
    from augmented_codebase_indexer_spark.operators.hll import cm_registers

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("value"))
        .filter(F.col("value") != "")
    )
    return cm_registers(toks)


def q_asset_metadata(spark, sf_dir):
    """Binary asset metadata without codecs (sources/multimodal.py):
    magic-byte format sniffing + PNG (big-endian u32) / GIF (little-
    endian u16) header dimensions + — r6 — JPEG SOF0 dimensions found by
    the bounded segment-list walk (SOI → APP0 → DQT → SOF0 here, so the
    walker must skip two length-prefixed segments before the frame
    header). Assets are synthesized closed-form as unhex(hex-string)
    from doc_id, so the oracle reconstructs (fmt, width, height)
    arithmetically."""
    from augmented_codebase_indexer_spark.sources.multimodal import (
        sniff_and_dimensions,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    w_png = "doc_id % 640 + 16"
    h_png = "doc_id % 480 + 16"
    w_gif = "doc_id % 320 + 1"
    h_gif = "doc_id % 200 + 1"
    w_jpg = "doc_id % 500 + 1"
    h_jpg = "doc_id % 300 + 1"
    hexstr = F.expr(
        "CASE doc_id % 4 "
        "WHEN 0 THEN concat('89504E470D0A1A0A0000000D49484452', "
        f"  lpad(hex({w_png}), 8, '0'), lpad(hex({h_png}), 8, '0'), '0806') "
        "WHEN 1 THEN concat('474946383961', "
        f"  lpad(hex(({w_gif}) % 256), 2, '0'), lpad(hex(({w_gif}) DIV 256), 2, '0'), "
        f"  lpad(hex(({h_gif}) % 256), 2, '0'), lpad(hex(({h_gif}) DIV 256), 2, '0'), '00') "
        # JPEG: FFD8 | APP0 len 4 + 2 payload | DQT len 3 + 1 payload |
        # SOF0 len 0x11, precision 8, height u16, width u16
        "WHEN 2 THEN concat('FFD8', 'FFE00004ABCD', 'FFDB000377', 'FFC0001108', "
        f"  lpad(hex({h_jpg}), 4, '0'), lpad(hex({w_jpg}), 4, '0'), '03') "
        "ELSE '0001DEADBEEF' END"
    )
    assets = d.select("doc_id", F.unhex(hexstr).alias("content"))
    return sniff_and_dimensions(assets).select("doc_id", "fmt", "width", "height")


def q_audio_metadata(spark, sf_dir):
    """RIFF/WAVE metadata without codecs (sources/multimodal.py::
    sniff_wav_metadata): bounded chunk-list walk for 'fmt '/'data' —
    the audio sibling of asset_metadata. Assets synthesized closed-form
    as unhex(hex) from doc_id: canonical WAVs, WAVs with a LIST chunk
    the walker must skip, and zip junk; the oracle reconstructs
    (sample_rate, channels, bits, duration_ms) arithmetically."""
    from augmented_codebase_indexer_spark.sources.multimodal import (
        sniff_wav_metadata,
    )

    def le16(x):
        return (f"lpad(hex(({x}) % 256), 2, '0'), "
                f"lpad(hex(({x}) DIV 256), 2, '0')")

    def le32(x):
        return ", ".join(
            f"lpad(hex(({x}) DIV {256 ** i} % 256), 2, '0')" for i in range(4)
        )

    sr = "(8000 + (doc_id % 8) * 1000)"
    ch = "(1 + doc_id % 2)"
    n = "(doc_id % 50 + 1)"
    block = f"({ch} * 2)"
    dsz = f"({n} * {block})"
    fmt_payload = (
        f"concat('0100', {le16(ch)}, {le32(sr)}, {le32(f'{sr} * {block}')}, "
        f"{le16(block)}, '1000')"
    )
    body = (
        f"concat('57415645', '666D7420', '10000000', {fmt_payload}, "
        f"'64617461', {le32(dsz)}, repeat('00', {dsz}))"
    )
    list_body = (
        f"concat('57415645', '4C495354', '04000000', '494E464F', "
        f"'666D7420', '10000000', {fmt_payload}, "
        f"'64617461', {le32(dsz)}, repeat('00', {dsz}))"
    )
    hexstr = F.expr(
        "CASE doc_id % 3 "
        f"WHEN 0 THEN concat('52494646', {le32(f'36 + {dsz}')}, {body}) "
        f"WHEN 1 THEN concat('52494646', {le32(f'48 + {dsz}')}, {list_body}) "
        "ELSE '504B0304DEADBEEF' END"
    )
    d = _t(spark, sf_dir, "documents").select("doc_id")
    assets = d.select("doc_id", F.unhex(hexstr).alias("content"))
    return sniff_wav_metadata(assets).select(
        "doc_id", "fmt", "sample_rate", "channels", "bits", "duration_ms"
    )


def q_video_metadata(spark, sf_dir):
    """ISO-BMFF movie metadata without codecs (sources/multimodal.py::
    sniff_mp4_metadata): top-level box walk to moov, nested walk to the
    v0 mvhd, timescale/duration as BE u32s. Assets synthesized
    closed-form: canonical ftyp+moov, a 'free' box the walker must step
    over, and junk; oracle reconstructs arithmetically."""
    from augmented_codebase_indexer_spark.sources.multimodal import (
        sniff_mp4_metadata,
    )

    ts = "(600 + (doc_id % 10) * 100)"
    dur = "((doc_id % 5000) + 1)"
    # ftyp payload = brand + minor_version + one compatible brand
    # (12 bytes) → declared box size 8 + 12 = 20 = 0x14
    ftyp = "'00000014', '66747970', '69736F6D', '00000200', '69736F6D'"
    mvhd = (
        f"'0000006C', '6D766864', '00000000', repeat('00', 8), "
        f"lpad(hex({ts}), 8, '0'), lpad(hex({dur}), 8, '0'), "
        "repeat('00', 80)"
    )
    moov = f"'00000074', '6D6F6F76', {mvhd}"
    hexstr = F.expr(
        "CASE doc_id % 3 "
        f"WHEN 0 THEN concat({ftyp}, {moov}) "
        f"WHEN 1 THEN concat({ftyp}, '0000000C', '66726565', 'DEADBEEF', "
        f"  {moov}) "
        "ELSE '0001020304DEADBEEF' END"
    )
    d = _t(spark, sf_dir, "documents").select("doc_id")
    assets = d.select("doc_id", F.unhex(hexstr).alias("content"))
    return sniff_mp4_metadata(assets).select(
        "doc_id", "fmt", "major_brand", "timescale", "duration_ms"
    )


def q_anchor_aliases(spark, sf_dir):
    """The loop the anchors module promises: anchor-term profiles on
    entity pages become gazetteer ALIAS CANDIDATES — (ent_id, alias,
    n votes, rank), entity recovered from the /entity/<id> href."""
    from augmented_codebase_indexer_spark.operators.anchors import (
        anchor_profile,
        anchor_texts,
    )
    from augmented_codebase_indexer_spark.sources.pages import (
        derive_pages_from_documents,
    )

    prof = anchor_profile(
        anchor_texts(derive_pages_from_documents(spark, sf_dir)), k=3
    )
    return prof.filter(F.col("href").startswith("/entity/")).select(
        F.regexp_extract("href", "^/entity/(.+)$", 1).alias("ent_id"),
        F.col("tok").alias("alias"),
        "n",
        "rank",
    )


def q_bloom_vocab(spark, sf_dir):
    """Bloom-filter set-bit table over the corpus vocabulary (operators/
    hll.py): the OR-mergeable membership sketch completing the trio —
    exact bit-table gate, membership tests display-path."""
    from augmented_codebase_indexer_spark.operators.hll import bloom_bits

    toks = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("value"))
        .filter(F.col("value") != "")
    )
    return bloom_bits(toks)


def q_dup_source_matrix(spark, sf_dir):
    """Cross-source duplication matrix: which sources copy which — the
    near-dup pairs joined back to each side's source, counted per
    unordered source pair. The syndication-diagnosis report a curation
    operator reads before setting per-source weights."""
    from augmented_codebase_indexer_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, threshold=0.8, n=1, max_df=50)
    s = d.select("doc_id", "source")
    j = (
        pairs.join(s.select(F.col("doc_id").alias("ida"),
                            F.col("source").alias("sa")), "ida")
        .join(s.select(F.col("doc_id").alias("idb"),
                       F.col("source").alias("sb")), "idb")
    )
    return (
        j.select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_dup_pairs"))
    )


def q_component_sizes(spark, sf_dir):
    """Connected-component size histogram over the entity graph: the CC
    operator (min-label propagation) gated DIRECTLY — (size,
    n_components), the graph-fragmentation diagnostic entity resolution
    reads (one giant component = over-merge; dust = under-merge)."""
    from augmented_codebase_indexer_spark.operators.components import (
        connected_components,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    edges = spark.sql(_entity_graph_sql("spark")).filter("src <> dst")
    nodes = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    cc = connected_components(nodes, edges)
    return (
        cc.groupBy("component")
        .agg(F.count("*").alias("size"))
        .groupBy("size")
        .agg(F.count("*").cast("long").alias("n_components"))
        .select(F.col("size").cast("long").alias("size"), "n_components")
    )


def q_rerank_search(spark, sf_dir):
    from augmented_codebase_indexer_spark.plans.search import rerank_search

    return rerank_search(_t(spark, sf_dir, "documents"), "spark window join", k=10)


def q_profile(spark, sf_dir):
    # column profiling: null/distinct/min/max per column in ONE aggregation
    from augmented_codebase_indexer_spark.operators.profiling import profile_table

    return profile_table(
        _t(spark, sf_dir, "documents"), ["doc_id", "lang", "source", "n_chars"]
    )


def q_moving_avg(spark, sf_dir):
    # RANGE-frame window: each event's trailing-1h per-user average — the
    # time-series smoothing shape (range frame, not rows frame)
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("avg_1h"),
        F.count("*").over(w).alias("n_1h"),
    )


def q_pivot_counts(spark, sf_dir):
    # pivot: per-user event-type count matrix (groupBy().pivot() — Catalyst
    # rewrites to a single aggregation with conditional counts)
    e = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    out = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


def q_curation(spark, sf_dir):
    # end-to-end training-data curation: quality + lang filters → exact-dup
    # winners → token chunks (the nightly 100TB composition, fully mirrored)
    from augmented_codebase_indexer_spark.plans.curation import curation_pipeline

    return curation_pipeline(_t(spark, sf_dir, "documents"))


def q_curation_v2(spark, sf_dir):
    # the full nightly pass with corpus-level filters in front: cross-doc
    # boilerplate removal → repetition filter → quality/lang → dedup →
    # chunks (plans/curation.py::curation_pipeline_v2, fully mirrored)
    from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v2

    return curation_pipeline_v2(_t(spark, sf_dir, "documents"))


def q_curation_v3(spark, sf_dir):
    # the complete hygiene chain: boilerplate → PII redaction → Gopher
    # rules → benchmark decontamination → dedup winners → chunks, with
    # n=3 decontam grams for the tiny synthetic vocab (default 13 at scale)
    from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v3

    return curation_pipeline_v3(_t(spark, sf_dir, "documents"), decontam_n=3)


def q_curation_v4(spark, sf_dir):
    # v3 with cluster-level NEAR-dedup (minhash pairs → components →
    # keep min id per cluster) replacing the exact-hash winner
    from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v4

    return curation_pipeline_v4(_t(spark, sf_dir, "documents"), decontam_n=3)


def q_curation_v5(spark, sf_dir):
    # v4 + the CCNet stage: cleaned-corpus LM scores every doc, tail
    # bucket drops before dedup. decontam_n=3 matches the tiny synthetic
    # vocab (v3/v4 precedent).
    from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v5

    return curation_pipeline_v5(
        _t(spark, sf_dir, "documents"), decontam_n=3
    )


def q_curation_v6(spark, sf_dir):
    # v5 with the TRAINED char-n-gram LID in place of the marker
    # heuristic (VERDICT r5 Next #4): the CCNet LID → LM quality →
    # filter chain composed end-to-end. Trained on the documents
    # table's own lang labels, scoring the boilerplate-pruned text;
    # keep-set joins back doc_id-keyed (can be ~90% of corpus — never
    # broadcast).
    from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v5

    return curation_pipeline_v5(
        _t(spark, sf_dir, "documents"), decontam_n=3,
        lid="trained", lid_langs=["de", "en", "es", "fr", "zh"],
    )


def q_bm25_search(spark, sf_dir):
    # BM25 ranked retrieval (Okapi k1=1.2, b=0.75) with the repo's exact
    # integer gate: Robertson idf through the libm-free intlog
    # (ln((N-df+0.5)/(df+0.5)) as the doubled-integer rational), staged
    # trunc-division tf/length normalization, one quantize-once
    # (adl_micro). Three narrow aggregations + a broadcast idf join;
    # top-k plans as TakeOrderedAndProject.
    from augmented_codebase_indexer_spark.operators.bm25 import bm25_search

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_search(d, ["spark", "window", "join"], k=25)


def q_er_matches(spark, sf_dir):
    # blocked pairwise entity resolution (operators/er.py): surface-form
    # variants synthesized closed-form from doc_id ('Brand7' / 'Brand 7' /
    # 'brand-7x' / 'Brund7'), normalized, blocked on the 5-char prefix,
    # matched by exact integer levenshtein ≤ 1 or containment — the
    # dedup step a multi-source KG runs over its entity table. The
    # block-size guard is raised for this deliberately two-block corpus;
    # the guard itself is pytest-gated (test_er.py).
    from augmented_codebase_indexer_spark.operators.er import er_matches

    d = _t(spark, sf_dir, "documents").select("doc_id")
    name = F.expr(
        "CASE doc_id % 4 "
        "WHEN 0 THEN concat('Brand', doc_id % 50) "
        "WHEN 1 THEN concat('Brand ', doc_id % 50) "
        "WHEN 2 THEN concat('brand-', doc_id % 50, 'x') "
        "ELSE concat('Brund', doc_id % 50) END"
    )
    ents = d.select(F.col("doc_id").alias("ent_id"), name.alias("name"))
    return er_matches(ents, max_dist=1, block_prefix=5, max_block_size=10000)


def q_proximity_search(spark, sf_dir):
    # positional-postings proximity query (operators/postings.py): all
    # terms within a 12-token window, minimal covering span per doc —
    # the inverted-index complement to the scan-based phrase tier.
    # doc_id-keyed k-way join of capped postings, pruned per join step.
    from augmented_codebase_indexer_spark.operators.postings import (
        proximity_search,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return proximity_search(d, ["spark", "window", "join"], window=12)


def q_graph_walks(spark, sf_dir):
    # deterministic random walks over the entity graph (operators/
    # walks.py): the DeepWalk/node2vec training-corpus generator with a
    # hash-based next-hop choice both engines evaluate identically —
    # walk sequences are TRAINING DATA, so they get the full oracle gate.
    from augmented_codebase_indexer_spark.operators.walks import (
        deterministic_walks,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return deterministic_walks(
        spark.sql(_entity_graph_sql("spark")), walk_len=4, walks_per_node=2
    )


def q_paragraph_dedup(spark, sf_dir):
    # RefinedWeb/CCNet paragraph-level exact dedup: repeated paragraphs
    # (footers, banners, syndication) dropped everywhere but their first
    # occurrence, docs reassembled in order. The global vote groups by
    # md5(para) (map-side combinable; text never rides that exchange);
    # the keep-join is hash-keyed and AQE-skew-splittable.
    from augmented_codebase_indexer_spark.operators.paradedup import (
        paragraph_dedup,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return paragraph_dedup(spark.sql(_token_paras_sql("spark")), sep=" ")


def q_lpa_communities(spark, sf_dir):
    # deterministic synchronous label propagation (Raghavan PRE'07) over
    # the entity graph: density communities inside reachability
    # components. Each round = one node-keyed equi-join + two map-side-
    # combinable groupBys; min(struct(-cnt, lbl)) argmax, no window.
    from augmented_codebase_indexer_spark.operators.communities import (
        lpa_communities,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return lpa_communities(spark.sql(_entity_graph_sql("spark")), rounds=4)


def q_kg_bgp_match(spark, sf_dir):
    # SPARQL-style basic graph pattern over the typed triple table
    # (Pérez TODS'09 bag semantics): employees with a recorded
    # birthplace — two subject-keyed patterns joined declaratively so
    # Catalyst/AQE picks the join strategy. Constants push down as
    # pattern-local filters; cartesian patterns are rejected.
    from augmented_codebase_indexer_spark.operators.bgp import bgp_match

    return bgp_match(
        _typed_triples(spark, sf_dir),
        [("?p", "works_at", "?org"), ("?p", "born_in", "?city")],
    )


def q_mention_commonness(spark, sf_dir):
    # wikification commonness prior P(target | anchor phrase) (Milne &
    # Witten CIKM'08) over a closed-form ambiguous anchor relation:
    # 'brand K' points at /e/K mostly, and at a minority sense from
    # docs ≡0 (mod 7) — rank 1 is the prior disambiguation, the full
    # table is the linker's candidate set. One pair groupBy + one
    # total + a candidate-vocabulary-bounded window; one trunc division.
    from augmented_codebase_indexer_spark.operators.anchors import (
        mention_commonness,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return mention_commonness(spark.sql(_ambiguous_anchors_sql("spark")))


def q_daily_bursts(spark, sf_dir):
    # ratio-test burst screen (batch two-state Kleinberg KDD'02) over
    # the events stream: integer cross-multiplied verdict at 6/5, one
    # map-side-combined (key, day) groupBy + slim totals, 1-row
    # day-count broadcast. The trending-entity signal per crawl.
    from augmented_codebase_indexer_spark.operators.bursts import daily_bursts

    return daily_bursts(
        _t(spark, sf_dir, "events").select("event_type", "ts"),
        factor=(6, 5),
    )


def q_kg_negatives(spark, sf_dir):
    # filtered type-consistent negative sampling (TransE NIPS'13) over
    # the typed triples: training data, so full oracle gate — the
    # "random" corruption is the md5 H60 hash mod the predicate's own
    # object pool (no RNG state, reproducible at any parallelism).
    from augmented_codebase_indexer_spark.operators.negatives import (
        negative_samples,
    )

    return negative_samples(_typed_triples(spark, sf_dir), k=2)


def q_walk_skipgrams(spark, sf_dir):
    # skip-gram co-occurrence counts over the walk corpus — the actual
    # DeepWalk/node2vec training input (and the SGNS/PMI matrix, Levy &
    # Goldberg NIPS'14). One walk-id-keyed self-join + banded filter +
    # map-side-combined count. Completes walks → pairs → negatives.
    from augmented_codebase_indexer_spark.operators.walks import (
        deterministic_walks,
        skipgram_pairs,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    walks = deterministic_walks(
        spark.sql(_entity_graph_sql("spark")), walk_len=4, walks_per_node=2
    )
    return skipgram_pairs(walks, window=2)


def q_graph_hits(spark, sf_dir):
    # HITS hubs & authorities (Kleinberg JACM'99), exact-integer
    # max-norm variant: each half-step is one node-keyed equi-join of
    # the slim score relation + a map-side-combined sum + a 1-row max
    # broadcast. The hub/authority split PageRank conflates.
    from augmented_codebase_indexer_spark.operators.hits import hits_scores

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return hits_scores(spark.sql(_entity_graph_sql("spark")), rounds=3)


def q_predicate_alignment(spark, sf_dir):
    # instance-based predicate alignment (PARIS VLDB'12 §4) over triples
    # with a planted synonym ('employer' ≡ works_at on even docs):
    # exact-integer Jaccard of the distinct (subj, obj) extensions, one
    # subject-leading self-equi-join, sizes broadcast.
    from augmented_codebase_indexer_spark.operators.predalign import (
        predicate_alignment,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return predicate_alignment(
        spark.sql(_synonym_triples_sql("spark")), threshold=(1, 3)
    )


def q_clustering_coeff(spark, sf_dir):
    # Watts-Strogatz local clustering per node over the entity graph:
    # composes the degree-oriented triangle count (Suri-Vassilvitskii
    # wedge bound) with degrees; 2·tri/(deg·(deg−1)) as one trunc
    # division. Canonicalization QA: over-merged entities are
    # high-degree low-cc outliers.
    from augmented_codebase_indexer_spark.operators.graphalgs import (
        clustering_coefficients,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return clustering_coefficients(spark.sql(_entity_graph_sql("spark")))


def _literal_triples_sql(dialect: str) -> str:
    """Closed-form triples whose objects sweep the literal taxonomy:
    integers, negative decimals, valid ISO dates, regex-valid-but-
    calendar-invalid dates (month 13 — must fall back to entity),
    booleans, and plain entity ids."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT 'e' || CAST(doc_id % 101 AS {s}) AS subj,
           CASE doc_id % 6 WHEN 0 THEN 'population' WHEN 1 THEN 'rate'
                WHEN 2 THEN 'founded' WHEN 3 THEN 'active'
                WHEN 4 THEN 'updated' ELSE 'works_at' END AS pred,
           CASE doc_id % 6
             WHEN 0 THEN CAST(doc_id AS {s})
             WHEN 1 THEN '-' || CAST(doc_id % 100 AS {s}) || '.' ||
                         CAST(doc_id % 1000 AS {s})
             WHEN 2 THEN '20' || lpad(CAST(doc_id % 30 AS {s}), 2, '0')
                         || '-' || lpad(CAST(doc_id % 12 + 1 AS {s}), 2, '0')
                         || '-' || lpad(CAST(doc_id % 28 + 1 AS {s}), 2, '0')
             WHEN 3 THEN CASE WHEN doc_id % 2 = 0 THEN 'true' ELSE 'False' END
             WHEN 4 THEN '1999-13-' || lpad(CAST(doc_id % 28 + 1 AS {s}), 2, '0')
             ELSE 'ent' || CAST(doc_id % 9 AS {s})
           END AS obj
    FROM documents"""


def q_kg_literals(spark, sf_dir):
    # object-literal typing (RDF datatype normalization for extracted
    # string objects): regex-gated BEFORE any cast (bare string→number
    # casts diverge across engines), pure string arithmetic for decimal
    # micro parsing, calendar validation via try_cast. One codegen
    # projection — no shuffle, no Python.
    from augmented_codebase_indexer_spark.operators.literals import (
        type_object_literals,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return type_object_literals(spark.sql(_literal_triples_sql("spark")))


def _interval_tables_sql(dialect: str) -> tuple[str, str]:
    """Two closed-form interval tables sharing entity keys, engineered
    so the pair classification sweeps many of the 13 Allen relations."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    a = f"""
    SELECT DISTINCT 's' || CAST(doc_id % 40 AS {s}) AS subj_id,
           'p' AS pred,
           (doc_id % 10) * 10 AS valid_from,
           (doc_id % 10) * 10 + 20 AS valid_to
    FROM documents"""
    b = f"""
    SELECT DISTINCT 's' || CAST(doc_id % 40 AS {s}) AS subj_id,
           'p' AS pred,
           (doc_id % 7) * 12 AS valid_from,
           (doc_id % 7) * 12 + 15 AS valid_to
    FROM documents"""
    return a, b


def q_allen_relations(spark, sf_dir):
    # the 13 Allen interval relations (Allen CACM'83) over half-open
    # SCD2-style [s, e) intervals: the KG temporal-QA operator
    # ('works_at DURING lives_in', versions that OVERLAP when they
    # shouldn't). Key-equi-join, pure integer CASE ladder.
    from augmented_codebase_indexer_spark.operators.temporal import (
        allen_relations,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    a_sql, b_sql = _interval_tables_sql("spark")
    return allen_relations(spark.sql(a_sql), spark.sql(b_sql))


def q_snippet_search(spark, sf_dir):
    # search-result snippets: the proximity min-span widened by 4
    # context tokens, re-sliced from the doc's token sequence (clamped
    # at both edges) — the read-path extract a search UI renders. One
    # extra doc_id-keyed join against the (tiny) hit set.
    from augmented_codebase_indexer_spark.operators.postings import (
        snippet_search,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return snippet_search(d, ["spark", "window", "join"], window=12,
                          context=4)


def _robots_files_sql(dialect: str) -> str:
    """Closed-form robots.txt files: every domain gets a rule group;
    even docs contribute an absolute Sitemap directive (the crawl-chain
    link), odd docs a relative one the parser must ignore."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT 'd' || CAST(doc_id % 50 AS {s}) || '.example' AS domain,
           'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10) ||
           CASE WHEN doc_id % 2 = 0
                THEN 'Sitemap: https://d' || CAST(doc_id % 50 AS {s}) ||
                     '.example/s' || CAST(doc_id % 3 AS {s}) || '.xml'
                ELSE 'Sitemap: relative.xml' END AS robots_txt
    FROM documents"""


def q_robots_sitemaps(spark, sf_dir):
    # the robots → sitemaps discovery link (sitemaps.org): Sitemap:
    # directives extracted case-insensitively, relative values ignored,
    # duplicates collapsed — feeds operators/sitemaps.parse_sitemap so
    # URL discovery starts from the politeness file itself.
    from augmented_codebase_indexer_spark.operators.robots import (
        robots_sitemaps,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return robots_sitemaps(spark.sql(_robots_files_sql("spark")))


def q_event_funnel(spark, sf_dir):
    # strict-order earliest-completion funnel (signup → click →
    # purchase) over the events stream: one filtered min-groupBy + one
    # user-keyed left join per step (predicate IN the join — partial
    # completions keep their row), timestamps gated as epoch seconds.
    from augmented_codebase_indexer_spark.operators.funnel import (
        funnel_analysis,
    )

    return funnel_analysis(
        _t(spark, sf_dir, "events").select("user_id", "event_type", "ts"),
        ["signup", "click", "purchase"],
    )


def q_retention_cohorts(spark, sf_dir):
    # weekly retention cohorts (r6c): integer week grid from a fixed
    # epoch (no date_trunc week-start convention), DISTINCT (user, week)
    # collapses map-side, cohort join rides the user key, rate is one
    # trunc division. The "of hosts first seen in week W, how many
    # reappear" crawl signal.
    from augmented_codebase_indexer_spark.operators.cohorts import (
        retention_cohorts,
    )

    return retention_cohorts(
        _t(spark, sf_dir, "events").select("user_id", "ts")
    )


def q_event_transitions(spark, sf_dir):
    # first-order Markov transition matrix (r6c): ONE user-partitioned
    # lead() window (deterministic via the event_id tiebreak), pairs
    # collapse into the |types|² vocabulary map-side, margins join back
    # as a broadcast. Row-stochastic p as trunc division.
    from augmented_codebase_indexer_spark.operators.transitions import (
        event_transitions,
    )

    return event_transitions(_t(spark, sf_dir, "events"))


def q_readability(spark, sf_dir):
    # LIX/RIX readability (r6c): pure surface counts in one narrow
    # codegen projection — zero exchanges, zero UDFs; scores gated as
    # trunc-division micro integers, bands on the published 25/35/45/55
    # cuts. The cheap prose-quality feature next to the Gopher rules.
    from augmented_codebase_indexer_spark.operators.readability import (
        readability_scores,
    )

    return readability_scores(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )


def q_collocations(spark, sf_dir):
    # Dunning G² bigram collocations (r6c): pairs built ARRAY-side (no
    # token explode over an exchange), margins as vocabulary-sized
    # broadcasts, all four 2×2 log terms from the libm-free intlog —
    # the gate is a pure BIGINT sum of products.
    from augmented_codebase_indexer_spark.operators.collocations import (
        bigram_llr,
    )

    return bigram_llr(_t(spark, sf_dir, "documents").select("doc_id", "text"))


def _param_pages_sql(dialect: str) -> str:
    """Synthetic capture relation (url, content_hash) with a planted
    tracking parameter: content depends on (block, id) only, so 'utm'
    varies within every content-identical residual group (strippable)
    while 'id' splits hashes inside its groups (kept)."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    div = "DIV" if dialect == "spark" else "//"
    return f"""
    SELECT 'https://h.example/p' || CAST(doc_id {div} 8 AS {s})
           || '?id=' || CAST(doc_id % 4 AS {s})
           || '&utm=' || CAST(doc_id % 3 AS {s}) AS url,
           md5('c' || CAST(doc_id {div} 8 AS {s}) || ':'
               || CAST(doc_id % 4 AS {s})) AS content_hash
    FROM documents"""


def q_url_param_rules(spark, sf_dir):
    # tracking-parameter rule mining (r6c): per-key residual grouping —
    # a param is strippable when every ≥2-capture residual group is
    # content-clean. Pure string surgery + counts; no joins at all —
    # the evidence that replaces a static utm_* denylist.
    from augmented_codebase_indexer_spark.operators.urlparams import (
        param_rules,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return param_rules(spark.sql(_param_pages_sql("spark")))


def _host_paras_sql(dialect: str) -> str:
    """Paragraph relation with a host key (5 synthetic hosts over the
    corpus) — the per-host template-detection input."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return (
        f"SELECT 'h' || CAST(doc_id % 5 AS {s}) AS host, doc_id, para "
        f"FROM ({_token_paras_sql(dialect)})"
    )


def q_host_boilerplate(spark, sf_dir):
    # per-host template paragraphs (r6c): DISTINCT (host, para, doc)
    # collapses map-side, one (host, para) groupBy, host totals join
    # back broadcast; verdict is the integer cross-multiply at a 3%
    # share with a 3-doc floor (thresholds chosen so the synthetic
    # corpus yields a mixed verdict: 22 templates of ~8.8k paras).
    from augmented_codebase_indexer_spark.operators.hostboiler import (
        host_templates,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return host_templates(
        spark.sql(_host_paras_sql("spark")), min_docs=3, share=(3, 100)
    )


def _salience_mentions_sql(dialect: str) -> str:
    """Synthetic mention stream: per doc one entity mentioned twice
    (once at position 0) and a second entity once, late — so rank-1
    flips to the repeated/early one everywhere."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT doc_id, 'e' || CAST(doc_id % 37 AS {s}) AS entity,
           CAST(0 AS BIGINT) AS pos FROM documents
    UNION ALL
    SELECT doc_id, 'e' || CAST(doc_id % 37 AS {s}),
           CAST(doc_id % 90 + 10 AS BIGINT) FROM documents
    UNION ALL
    SELECT doc_id, 'e' || CAST((doc_id * 7 + 3) % 37 AS {s}),
           CAST(doc_id % 110 + 5 AS BIGINT) FROM documents"""


def _doc_tokens_sql() -> str:
    return ("SELECT doc_id, CAST(120 + doc_id % 200 AS BIGINT) "
            "AS n_tokens FROM documents")


def q_entity_salience(spark, sf_dir):
    # entity salience (r6c): which entity is each page ABOUT —
    # frequency share + first-position blend, all BIGINT; one
    # (doc, entity) groupBy, doc totals on the same key, doc-bounded
    # rank window.
    from augmented_codebase_indexer_spark.operators.salience import (
        entity_salience,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return entity_salience(
        spark.sql(_salience_mentions_sql("spark")),
        spark.sql(_doc_tokens_sql()),
    )


def _coverage_spans_sql(dialect: str) -> str:
    """Three span families per doc: one short (degenerate every 25th
    doc), one fixed-width overlapping it, one far past the doc length
    (exercises the edge clip)."""
    return """
    SELECT doc_id, CAST(doc_id % 60 AS BIGINT) AS s,
           CAST(doc_id % 60 + doc_id % 25 AS BIGINT) AS e FROM documents
    UNION ALL
    SELECT doc_id, CAST((doc_id * 3) % 70 AS BIGINT),
           CAST((doc_id * 3) % 70 + 15 AS BIGINT) FROM documents
    UNION ALL
    SELECT doc_id, CAST(doc_id % 40 + 80 AS BIGINT),
           CAST(doc_id % 40 + 200 AS BIGINT) FROM documents"""


def q_span_coverage(spark, sf_dir):
    # span-union coverage (r6c): the per-doc "how much of it is inside
    # these spans" QA stat (contamination share, PII share) — one
    # doc-partitioned sweep window + one groupBy, overlap never
    # overcounts, only per-doc sums cross the gate (tie-order safe).
    from augmented_codebase_indexer_spark.operators.coverage import (
        span_coverage,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    toks = ("SELECT doc_id, CAST(100 + doc_id % 50 AS BIGINT) "
            "AS n_tokens FROM documents")
    return span_coverage(
        spark.sql(_coverage_spans_sql("spark")), spark.sql(toks)
    )


def _kappa_sides_sql(dialect: str) -> tuple[str, str]:
    """Two synthetic extractor verdicts over the doc universe: b skips
    every 7th doc (joint-set semantics) and adds every 5th to 'keep'."""
    a = ("SELECT doc_id AS item, CASE WHEN doc_id % 3 = 0 THEN 'keep' "
         "ELSE 'drop' END AS label FROM documents")
    b = ("SELECT doc_id AS item, CASE WHEN doc_id % 5 = 0 OR "
         "doc_id % 3 = 0 THEN 'keep' ELSE 'drop' END AS label "
         "FROM documents WHERE doc_id % 7 <> 0")
    return a, b


def q_extractor_kappa(spark, sf_dir):
    # Cohen's kappa between two extractor families (r6c): the chance-
    # corrected agreement QA stat — one item-keyed join, label-
    # vocabulary marginals, single-row BIGINT fold.
    from augmented_codebase_indexer_spark.operators.agreement import (
        cohens_kappa,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    a_sql, b_sql = _kappa_sides_sql("spark")
    return cohens_kappa(spark.sql(a_sql), spark.sql(b_sql))


def _typed_cells_sql(dialect: str) -> str:
    """Closed-form (url, table_idx, row_idx, col_idx, cell) relation
    mirroring the typed-columns table q_webtable_types renders as HTML:
    name=entity, age=integer with an 'n/a' minority, score=a
    decimal/integer split, since=always-valid dates."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    u = "'https://t.example/' || CAST(doc_id AS " + s + ")"
    age = (f"CASE WHEN doc_id % 4 = 0 THEN 'n/a' "
           f"ELSE CAST(doc_id % 90 AS {s}) END")
    score = (f"CASE WHEN doc_id % 2 = 0 "
             f"THEN '1.' || CAST(doc_id % 10 AS {s}) "
             f"ELSE CAST(doc_id % 10 AS {s}) END")
    since = (f"'201' || CAST(doc_id % 10 AS {s}) || '-0' || "
             f"CAST(doc_id % 9 + 1 AS {s}) || '-1' || "
             f"CAST(doc_id % 10 AS {s})")
    heads = " UNION ALL ".join(
        f"SELECT {u} AS url, 1 AS table_idx, 1 AS row_idx, "
        f"{i + 1} AS col_idx, '{h}' AS cell FROM documents"
        for i, h in enumerate(["name", "age", "score", "since"])
    )
    vals = [f"'Entity' || CAST(doc_id % 50 AS {s})", age, score, since]
    data = " UNION ALL ".join(
        f"SELECT {u}, 1, 2, {i + 1}, {v} FROM documents"
        for i, v in enumerate(vals)
    )
    return f"{heads} UNION ALL {data}"


def q_webtable_types(spark, sf_dir):
    # web-table column typing (r6c): the WebTables schema half — parse
    # real HTML (three codegen explodes), pair cells with headers, type
    # every value with the shared literal rules, strict-majority vote
    # per column.
    from augmented_codebase_indexer_spark.operators.webtables import (
        column_types,
        extract_table_cells,
        table_relations,
    )

    d = _t(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 50).cast("string")
    age = F.when(F.col("doc_id") % 4 == 0, F.lit("n/a")).otherwise(
        (F.col("doc_id") % 90).cast("string"))
    score = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("1."), (F.col("doc_id") % 10).cast("string")),
    ).otherwise((F.col("doc_id") % 10).cast("string"))
    since = F.concat(
        F.lit("201"), (F.col("doc_id") % 10).cast("string"),
        F.lit("-0"), (F.col("doc_id") % 9 + 1).cast("string"),
        F.lit("-1"), (F.col("doc_id") % 10).cast("string"),
    )
    html_str = F.concat(
        F.lit("<table><tr><th>name</th><th>age</th><th>score</th>"
              "<th>since</th></tr><tr><td>Entity"), k,
        F.lit("</td><td>"), age, F.lit("</td><td>"), score,
        F.lit("</td><td>"), since, F.lit("</td></tr></table>"),
    )
    pages = d.select(
        F.concat(F.lit("https://t.example/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.encode(html_str, "UTF-8").alias("html"),
    )
    return column_types(table_relations(extract_table_cells(pages)))


def _weighted_graph_sql(dialect: str) -> tuple[str, str]:
    """Weighted 97-node digraph + 3 seed nodes for the SSSP entry;
    parallel doc-generated edges exercise the min-absorb."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    div = "DIV" if dialect == "spark" else "//"
    edges = f"""
    SELECT CAST(doc_id % 97 AS {s}) AS src,
           CAST((doc_id * 11 + 7) % 97 AS {s}) AS dst,
           CAST(1 + doc_id % 5 AS BIGINT) AS w FROM documents
    UNION ALL
    SELECT CAST(doc_id % 97 AS {s}),
           CAST((doc_id {div} 2) % 97 AS {s}),
           CAST(1 + doc_id % 3 AS BIGINT) FROM documents"""
    seeds = ("SELECT '0' AS node UNION ALL SELECT '13' "
             "UNION ALL SELECT '42'")
    return edges, seeds


def q_kg_shortest_paths(spark, sf_dir):
    # weighted seed-set shortest paths (r6c): fixed-round Bellman-Ford
    # — per round ONE node-keyed equi-join of the slim (node, dist)
    # frontier + a min-groupBy; exact for paths ≤ rounds edges (the
    # traversal-family bounded-horizon contract).
    from augmented_codebase_indexer_spark.operators.sssp import (
        shortest_paths,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    e_sql, s_sql = _weighted_graph_sql("spark")
    return shortest_paths(spark.sql(e_sql), spark.sql(s_sql), rounds=4)


def q_wlm_relatedness(spark, sf_dir):
    # Witten-Milne link relatedness (r6c): in-link overlap pairs from
    # ONE linker-keyed self-join, every ln from the intlog evaluated
    # once per DISTINCT count value and broadcast back — the
    # relatedness half of the wikification stack (commonness is the
    # prior half).
    from augmented_codebase_indexer_spark.operators.relatedness import (
        wlm_relatedness,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return wlm_relatedness(
        spark.sql(_entity_graph_sql("spark")), min_common=2
    )


def _symmetric_triples_sql(dialect: str) -> str:
    """Triples over two symmetric predicates + a non-symmetric one;
    every 6th spouse fact gets its mirror (satisfied), the rest are
    one-directional violations."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    p = ("CASE WHEN doc_id % 3 = 0 THEN 'spouse' "
         "WHEN doc_id % 3 = 1 THEN 'sibling' ELSE 'works_at' END")
    return f"""
    SELECT 's' || CAST(doc_id % 40 AS {s}) AS subj, {p} AS pred,
           's' || CAST((doc_id * 7 + 1) % 40 AS {s}) AS obj
    FROM documents
    UNION ALL
    SELECT 's' || CAST((doc_id * 7 + 1) % 40 AS {s}), 'spouse',
           's' || CAST(doc_id % 40 AS {s})
    FROM documents WHERE doc_id % 6 = 0"""


def q_kg_symmetry(spark, sf_dir):
    # OWL SymmetricProperty QA (r6c): one-directional symmetric facts
    # via a single reversed-key left-anti self-join over the distinct
    # facts of the (small) symmetric-predicate family.
    from augmented_codebase_indexer_spark.operators.kgquality import (
        symmetry_violations,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return symmetry_violations(
        spark.sql(_symmetric_triples_sql("spark")), ("spouse", "sibling")
    )


def _hostlang_docs_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    div = "DIV" if dialect == "spark" else "//"
    return f"""
    SELECT 'h' || CAST(doc_id % 7 AS {s}) AS host,
           CASE WHEN (doc_id {div} 7) % 5 = doc_id % 7 THEN 'de'
                WHEN doc_id % 7 = 3 AND doc_id % 2 = 0 THEN 'fr'
                ELSE 'en' END AS lang
    FROM documents"""


def q_host_lang_profile(spark, sf_dir):
    # host-language consistency (r6c): per-host modal language +
    # outlier share + strict-majority mixed flag — one (host, lang)
    # groupBy then a host-keyed min(struct) argmax, no window.
    from augmented_codebase_indexer_spark.operators.hostlang import (
        host_language_profile,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return host_language_profile(spark.sql(_hostlang_docs_sql("spark")))


def _meta_pages_sql(dialect: str) -> str:
    """Closed-form html pages sweeping the metadata cases: title
    always, canonical on evens (href-first order on every 4th), robots
    noindex/nofollow on every 5th, meta-refresh on every 7th."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    i = f"CAST(doc_id AS {s})"
    canon = (
        "CASE WHEN doc_id % 4 = 0 THEN '<link href=\"https://c.example/'"
        f" || {i} || '\" rel=\"canonical\">' "
        "WHEN doc_id % 2 = 0 THEN '<link rel=\"canonical\" href=\"https://c.example/'"
        f" || {i} || '\">' ELSE '' END"
    )
    robots = ("CASE WHEN doc_id % 5 = 0 THEN "
              "'<meta name=\"robots\" content=\"NOINDEX, nofollow\">' "
              "ELSE '' END")
    refresh = (
        "CASE WHEN doc_id % 7 = 0 THEN "
        "'<meta http-equiv=\"refresh\" content=\"0; url=https://r.example/'"
        f" || {i} || '\">' ELSE '' END"
    )
    return (
        f"SELECT 'https://m.example/' || {i} AS url, "
        f"'<html><head><title>Doc ' || {i} || '</title>' || {canon} || "
        f"{robots} || {refresh} || '</head></html>' AS html "
        "FROM documents"
    )


def q_page_meta(spark, sf_dir):
    # page metadata extraction (r6c): title / rel=canonical / robots
    # meta / meta-refresh in ONE codegen projection; the oracle runs
    # the SAME backslash-free regexes over the same strings in DuckDB
    # — regex parity, not just arithmetic parity.
    from augmented_codebase_indexer_spark.operators.pagemeta import (
        page_meta,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return page_meta(spark.sql(_meta_pages_sql("spark")))


def _outline_pages_sql(dialect: str) -> str:
    """Heading trees varying by doc: h1 + two h2 sections, the second
    with an h3; every 3rd doc opens with an orphan h3."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    i = f"CAST(doc_id AS {s})"
    orphan = ("CASE WHEN doc_id % 3 = 0 THEN '<h3>early note</h3>' "
              "ELSE '' END")
    return (
        f"SELECT 'https://o.example/' || {i} AS url, "
        f"{orphan} || '<h1>Doc ' || {i} || '</h1><h2>intro</h2>"
        "<h2>details</h2><h3>sub ' || "
        f"CAST(doc_id % 9 AS {s}) || '</h3>' AS html FROM documents"
    )


def q_heading_outline(spark, sf_dir):
    # heading outline (r6c): h1-h3 section tree with nearest-shallower
    # parents from per-level running-max windows — no self-join; html
    # dies inside the scan projection.
    from augmented_codebase_indexer_spark.operators.outline import (
        heading_outline,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return heading_outline(spark.sql(_outline_pages_sql("spark")))


def _triplet_anchors_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT 'q' || CAST(doc_id % 30 AS {s}) AS anchor,
           'u' || CAST(doc_id % 50 AS {s}) AS target
    FROM documents
    UNION ALL
    SELECT 'q' || CAST(doc_id % 30 AS {s}),
           'u' || CAST((doc_id * 13 + 2) % 50 AS {s})
    FROM documents WHERE doc_id % 4 = 0"""


def q_retrieval_triplets(spark, sf_dir):
    # anchor-text retrieval triplets (r6c): (query, pos, neg) training
    # tuples — hash-chosen negatives (no RNG state, restartable),
    # filtered protocol drops co-linked false negatives.
    from augmented_codebase_indexer_spark.operators.triplets import (
        retrieval_triplets,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return retrieval_triplets(spark.sql(_triplet_anchors_sql("spark")), k=2)


def _disambig_tables_sql(dialect: str) -> tuple[str, str]:
    """(mentions, anchors): 4 ambiguous surfaces with a planted
    majority/minority sense split, 6 unambiguous context surfaces;
    pages co-link minority senses with specific context entities so
    coherence has signal to flip the prior."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    anchors = f"""
    SELECT 'p' || CAST(doc_id AS {s}) AS src_url,
           'amb' || CAST(doc_id % 4 AS {s}) AS anchor,
           CASE WHEN doc_id % 3 = 0 THEN 'B' || CAST(doc_id % 4 AS {s})
                ELSE 'A' || CAST(doc_id % 4 AS {s}) END AS href
    FROM documents
    UNION ALL
    SELECT 'p' || CAST(doc_id AS {s}),
           'ctx' || CAST(doc_id % 6 AS {s}),
           'C' || CAST(doc_id % 6 AS {s})
    FROM documents"""
    mentions = f"""
    SELECT doc_id, 'amb' || CAST(doc_id % 4 AS {s}) AS surface
    FROM documents
    UNION ALL
    SELECT doc_id, 'ctx' || CAST(doc_id % 6 AS {s}) FROM documents
    UNION ALL
    SELECT doc_id, 'ctx' || CAST((doc_id + 1) % 6 AS {s}) FROM documents"""
    return mentions, anchors


def q_entity_disambig(spark, sf_dir):
    # Milne-Witten coherence disambiguation (r6c): the full
    # wikification decision — commonness prior blended with mean
    # WLM relatedness to the doc's unambiguous context entities;
    # composes mention_commonness + wlm_relatedness end-to-end.
    from augmented_codebase_indexer_spark.operators.disambig import (
        disambiguate,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    m_sql, a_sql = _disambig_tables_sql("spark")
    return disambiguate(spark.sql(m_sql), spark.sql(a_sql))


def _host_counts_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return (
        f"SELECT 'h' || CAST(doc_id % 13 AS {s}) AS host, "
        "CAST(count(*) AS BIGINT) AS n_pages FROM documents "
        "GROUP BY 1"
    )


def q_crawl_budget(spark, sf_dir):
    # Hamilton largest-remainder budget apportionment (r6c): integer
    # allocations that sum EXACTLY to the budget; the only window is
    # host-vocabulary-sized.
    from augmented_codebase_indexer_spark.operators.budget import (
        crawl_budget,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return crawl_budget(spark.sql(_host_counts_sql("spark")), budget=1000)


def _rollup_urls_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    deep = (f"CASE WHEN doc_id % 3 = 0 "
            f"THEN '/x' || CAST(doc_id % 4 AS {s}) ELSE '' END")
    return (
        f"SELECT 'https://s' || CAST(doc_id % 5 AS {s}) || "
        f"'.example/sec' || CAST(doc_id % 7 AS {s}) || '/page' || "
        f"CAST(doc_id % 11 AS {s}) || {deep} || "
        "CASE WHEN doc_id % 2 = 0 THEN '?q=1' ELSE '' END AS url "
        "FROM documents"
    )


def q_url_path_rollup(spark, sf_dir):
    # site-structure path-tree rollup (r6c): one bounded explode
    # (≤ depth+1 rows/url) + one (host, prefix) groupBy; query strings
    # never enter the prefix.
    from augmented_codebase_indexer_spark.operators.pathtree import (
        url_path_rollup,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return url_path_rollup(spark.sql(_rollup_urls_sql("spark")), max_depth=3)


def q_rake_keyphrases(spark, sf_dir):
    # RAKE keyphrases (r6c) over the REAL document text: doc-local
    # degree/frequency phrase scoring, everything rides the doc_id key.
    from augmented_codebase_indexer_spark.operators.rake import (
        rake_keyphrases,
    )

    return rake_keyphrases(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )


def _hreflang_pages_sql(dialect: str) -> str:
    """Pages paired by an involution (i ↔ (i+50) % 100 — reciprocal by
    construction); every doc with i % 7 = 0 declares an EXTRA alternate
    to its successor, which rarely declares back → violations."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    i = f"CAST(doc_id % 100 AS {s})"
    j = f"CAST((doc_id + 50) % 100 AS {s})"
    k = f"CAST((doc_id + 1) % 100 AS {s})"
    extra = (
        "CASE WHEN doc_id % 7 = 0 THEN "
        "'<link rel=\"alternate\" hreflang=\"fr\" href=\"https://x.example/p'"
        f" || {k} || '\">' ELSE '' END"
    )
    return (
        f"SELECT 'https://x.example/p' || {i} AS url, "
        "'<link rel=\"alternate\" hreflang=\"de\" href=\"https://x.example/p'"
        f" || {j} || '\">' || {extra} AS html "
        "FROM documents"
    )


def q_hreflang_recip(spark, sf_dir):
    # hreflang alternates + reciprocity QA (r6c): extraction like
    # page_meta (regex-parity oracle), verdict via one reversed-key
    # left join over the distinct alternate edge set.
    from augmented_codebase_indexer_spark.operators.hreflang import (
        hreflang_alternates,
        hreflang_reciprocity,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return hreflang_reciprocity(
        hreflang_alternates(spark.sql(_hreflang_pages_sql("spark")))
    )


def _hostedges_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT 'h' || CAST(doc_id % 9 AS {s}) AS src_host,
           CASE WHEN doc_id % 4 = 0 THEN 'h' || CAST(doc_id % 9 AS {s})
                ELSE 'h' || CAST((doc_id * 5 + 2) % 9 AS {s}) END
             AS dst_host
    FROM documents"""


def q_host_link_profile(spark, sf_dir):
    # host-level link-spam features (r6c): intra share, external
    # diversity, reciprocated-host share — everything host-cardinality-
    # sized after the first map-side collapse.
    from augmented_codebase_indexer_spark.operators.hostlinks import (
        host_link_profile,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return host_link_profile(spark.sql(_hostedges_sql("spark")))


def _rule_triples_sql(dialect: str) -> str:
    """Triples with a planted implication: employer(x,y) holds on 2/3
    of works_at pairs (std conf < PCA conf — subjects without any
    employer fact are PCA-invisible); lives_in shares no pair."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT 's' || CAST(doc_id % 30 AS {s}) AS subj, 'works_at' AS pred,
           'o' || CAST(doc_id % 12 AS {s}) AS obj
    FROM documents
    UNION ALL
    SELECT 's' || CAST(doc_id % 30 AS {s}), 'employer',
           'o' || CAST(doc_id % 12 AS {s})
    FROM documents WHERE doc_id % 3 <> 0
    UNION ALL
    SELECT 's' || CAST(doc_id % 30 AS {s}), 'lives_in',
           'c' || CAST(doc_id % 5 AS {s})
    FROM documents"""


def _kg_types_sql(dialect: str) -> str:
    """Entity-type table over the rule-mining fact synth: subjects are
    person except every 9th (bot noise); 'o' orgs with one id untyped;
    'c' cities with one id typed region (minority)."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT 's' || CAST(doc_id % 30 AS {s}) AS entity,
           CASE WHEN doc_id % 30 % 9 = 0 THEN 'bot'
                ELSE 'person' END AS type
    FROM documents
    UNION ALL
    SELECT 'o' || CAST(doc_id % 12 AS {s}), 'org'
    FROM documents WHERE doc_id % 12 <> 11
    UNION ALL
    SELECT 'c' || CAST(doc_id % 5 AS {s}),
           CASE WHEN doc_id % 5 = 4 THEN 'region' ELSE 'city' END
    FROM documents"""


def _sightings_sql(dialect: str) -> str:
    """Multi-source entity sightings with four planted capture-frequency
    profiles: 'org' sighted by the real 20-source column (saturated,
    f1~0 -> complete); 'person' singleton-only (f1=all, the f2=0
    bias-corrected branch); 'work' a 1/2/3-source mix (f1=f2=20);
    'place' doubletons-only (f1=0, f2=100). Profiles are scale-stable:
    the same f-vector emerges at every sf."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    idiv = "DIV" if dialect == "spark" else "//"
    return f"""
    SELECT 'org' AS class, 'o' || CAST(doc_id % 12 AS {s}) AS entity,
           source AS src
    FROM documents
    UNION ALL
    SELECT 'person', 'p' || CAST(doc_id % 45 AS {s}),
           'w' || CAST(doc_id % 45 % 9 AS {s})
    FROM documents
    UNION ALL
    SELECT 'work', 'k' || CAST(doc_id % 60 AS {s}),
           'w' || CAST(doc_id {idiv} 60 AS {s})
    FROM documents WHERE doc_id {idiv} 60 <= doc_id % 60 % 3
    UNION ALL
    SELECT 'place', 'c' || CAST(doc_id % 100 AS {s}),
           'w' || CAST((doc_id {idiv} 100) % 2 AS {s})
    FROM documents WHERE doc_id < 200"""


def q_kg_completeness(spark, sf_dir):
    # capture-recapture class completeness (r6d): bias-corrected Chao1
    # lower bound + Good-Turing unseen mass per class, all-BIGINT with
    # the unit-grain correction term (overflow-safe to f1 ~ 3e9);
    # answers "how much of class C has the pipeline NOT seen yet".
    from augmented_codebase_indexer_spark.operators.completeness import (
        class_completeness,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return class_completeness(spark.sql(_sightings_sql("spark")))


def _quote_pages_sql() -> str:
    """Planted attribution frames per doc (Spark dialect only — the
    oracle enumerates closed-form and never runs a regex): post_said +
    pre_said every doc, comma_attrib every 3rd, plus an orphan quote
    and a lowercase-speaker decoy that must never attribute."""
    def n(m: int) -> str:
        return f"CAST(doc_id % {m} AS STRING)"

    return f"""
    SELECT doc_id,
           '"release ' || {n(11)} || ' shipped" said Alice' || {n(5)}
           || '. Bob' || {n(4)} || ' said: "we expect ' || {n(7)}
           || ' growth". '
           || CASE WHEN doc_id % 3 = 0
                THEN '"costs fell ' || {n(6)} || '," Carol' || {n(9)}
                     || ' added. '
                ELSE '' END
           || '"orphan quote" stands alone. "mumble" said nobody.'
           AS text
    FROM documents"""


def q_quote_attribution(spark, sf_dir):
    # quotation attribution (r6d, O'Keefe ACL'12 / PARC frames): three
    # speech-verb frames with a capitalized-speaker gate, extracted by
    # one codegen regexp scan; the oracle is fully independent — it
    # enumerates the planted (frame, quote, speaker) rows from doc_id
    # arithmetic and never runs a regex.
    from augmented_codebase_indexer_spark.operators.quotes import (
        attribute_quotes,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return attribute_quotes(spark.sql(_quote_pages_sql()))


def _quote_expected_sql() -> str:
    def n(m: int) -> str:
        return f"CAST(doc_id % {m} AS VARCHAR)"

    return f"""
    SELECT doc_id, 'post_said' AS frame,
           'release ' || {n(11)} || ' shipped' AS quote,
           'Alice' || {n(5)} AS speaker
    FROM documents
    UNION ALL
    SELECT doc_id, 'pre_said',
           'we expect ' || {n(7)} || ' growth', 'Bob' || {n(4)}
    FROM documents
    UNION ALL
    SELECT doc_id, 'comma_attrib',
           'costs fell ' || {n(6)}, 'Carol' || {n(9)}
    FROM documents WHERE doc_id % 3 = 0"""


def _er_names_sql(dialect: str) -> str:
    """Name records with planted near-duplicates: 'a' canonicals, 'b'
    punctuation variants (dist 1), 'c' typo variants (dist 1), 'd'
    unrelated, 'e' both-ends-edited variants (dist 2) that the two-end
    blocking keys MISS by design — the pair-completeness metric
    measures exactly that. DISTINCT arms make record counts
    scale-stable."""
    s = "STRING" if dialect == "spark" else "VARCHAR"

    def r(m: int) -> str:
        return f"CAST(doc_id % {m} AS {s})"

    return f"""
    SELECT DISTINCT 'a' || {r(40)} AS id,
           'company ' || {r(40)} || ' corp' AS name FROM documents
    UNION ALL
    SELECT DISTINCT 'b' || {r(40)}, 'company ' || {r(40)} || ' corp.'
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT DISTINCT 'c' || {r(40)}, 'compamy ' || {r(40)} || ' corp'
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT DISTINCT 'd' || {r(25)}, 'zenith ' || {r(25)} || ' gmbh'
    FROM documents
    UNION ALL
    SELECT DISTINCT 'e' || {r(40)}, '1company ' || {r(40)} || ' corps'
    FROM documents WHERE doc_id % 4 = 0"""


def _er_truth_sql(dialect: str) -> str:
    """Closed-form ground-truth duplicate pairs: canonical↔variant
    links only (id_a < id_b lexicographically by arm prefix)."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    r = f"CAST(doc_id % 40 AS {s})"
    return f"""
    SELECT DISTINCT 'a' || {r} AS id_a, 'b' || {r} AS id_b
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT DISTINCT 'a' || {r}, 'c' || {r}
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT DISTINCT 'a' || {r}, 'e' || {r}
    FROM documents WHERE doc_id % 4 = 0"""


def q_er_name_blocking(spark, sf_dir):
    # ER name blocking (r6d): two-end blocking keys + exact
    # Levenshtein verification (engine-identical builtin), block-cap
    # guard idle at this scale; candidates include the planted
    # variants plus legitimate cross-id near-names — exactly mirrored.
    from augmented_codebase_indexer_spark.operators.nameblock import (
        block_candidates,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return block_candidates(
        spark.sql(_er_names_sql("spark")), max_dist=2, block_cap=500)


def q_er_blocking_quality(spark, sf_dir):
    # blocking-quality fold (r6d): pair completeness vs the planted
    # truth (the 'e' both-ends miss class keeps PC < 1e6) + reduction
    # ratio vs the n(n-1)/2 pair space, exact micro ints.
    from augmented_codebase_indexer_spark.operators.nameblock import (
        block_candidates,
        blocking_quality,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    names = spark.sql(_er_names_sql("spark"))
    truth = spark.sql(_er_truth_sql("spark"))
    return blocking_quality(
        block_candidates(names, max_dist=2, block_cap=500), truth, names)


def _growth_docs_sql(dialect: str) -> str:
    """Real corpus text plus one planted growth token per 3 docs, so
    the type curve keeps a measurable tail after the ~30-word natural
    vocabulary saturates in checkpoint 0."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    idiv = "DIV" if dialect == "spark" else "//"
    return f"""
    SELECT doc_id,
           text || ' u' || CAST(doc_id {idiv} 3 AS {s}) AS text
    FROM documents"""


def q_vocab_growth(spark, sf_dir):
    # Heaps-law vocabulary growth (r6d): exact type-arrival curve at
    # ingestion checkpoints + libm-free local exponent (intlog); the
    # sizing instrument for every "vocabulary-sized" broadcast frame.
    from augmented_codebase_indexer_spark.operators.vocabgrowth import (
        vocab_growth,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return vocab_growth(spark.sql(_growth_docs_sql("spark")),
                        bucket_docs=50)


def _acronym_pages_sql() -> str:
    """Planted definitions (Spark dialect only — the oracle enumerates
    closed-form): two fixed valid pairs, one doc-varying valid pair,
    one initials-mismatch decoy that must never verify."""
    return """
    SELECT doc_id,
           'knowledge graph systems (KGS) power search. '
           || 'we adopt open data (OD) today. '
           || 'flat rate pricing (XYZ) is a decoy. '
           || CASE doc_id % 3
                WHEN 0 THEN 'neural data store (NDS) ships.'
                WHEN 1 THEN 'web scale graph (WSG) grows.'
                ELSE 'managed vector index (MVI) lands.' END AS text
    FROM documents"""


def q_acronym_pairs(spark, sf_dir):
    # acronym-definition mining (r6d, Schwartz-Hearst PSB'03 initials
    # tier): regex candidates + array-op initials verification, all
    # codegen; oracle enumerates the planted pairs closed-form.
    from augmented_codebase_indexer_spark.operators.acronyms import (
        mine_acronyms,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return mine_acronyms(spark.sql(_acronym_pages_sql()))


def _acronym_expected_sql() -> str:
    return """
    SELECT doc_id, 'knowledge graph systems' AS long_form,
           'KGS' AS acronym FROM documents
    UNION ALL
    SELECT doc_id, 'open data', 'OD' FROM documents
    UNION ALL
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'neural data store'
                WHEN 1 THEN 'web scale graph'
                ELSE 'managed vector index' END,
           CASE doc_id % 3 WHEN 0 THEN 'NDS'
                WHEN 1 THEN 'WSG' ELSE 'MVI' END
    FROM documents"""


def _geo_places_sql(dialect: str) -> str:
    """Point entities in 35 well-separated 'towns' (1° apart, spanning
    negative coordinates) with per-doc jitter, so within-town pairs
    straddle the radius gate both ways and cross-town pairs never
    block together."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT 'g' || CAST(doc_id AS {s}) AS id,
           CAST((doc_id % 5 - 2) * 1000000
                + (doc_id % 3) * 40000 AS BIGINT) AS lat_micro,
           CAST((doc_id % 7 - 3) * 1000000
                + (doc_id % 4) * 30000 AS BIGINT) AS lon_micro
    FROM documents"""


def q_geo_candidates(spark, sf_dir):
    # geo grid blocking (r6d, grid-file hashing Nievergelt TODS'84):
    # 3x3 probe-side neighborhood over radius-sized integer cells +
    # exact squared micro-degree verification; no miss class inside
    # the radius, offset coordinates keep truncating DIV == floor.
    from augmented_codebase_indexer_spark.operators.geo import (
        geo_candidates,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return geo_candidates(
        spark.sql(_geo_places_sql("spark")), radius_micro=100_000)


_DTX_MONTHS = ("January", "February", "March", "April", "May", "June",
               "July", "August", "September", "October", "November",
               "December")


def _datetx_pages_sql(dialect: str) -> str:
    """Planted prose dates (Spark dialect executes; oracle enumerates
    closed-form): month-varying mdy every doc, a calendar-invalid
    decoy every doc, dmy every 2nd, inline ISO every 3rd."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    mon = " ".join(f"WHEN {i} THEN '{m}'"
                   for i, m in enumerate(_DTX_MONTHS))
    return f"""
    SELECT doc_id,
           'released on ' || CASE doc_id % 12 {mon} END || ' '
           || CAST(doc_id % 28 + 1 AS {s}) || ', '
           || CAST(2001 + doc_id % 25 AS {s})
           || '. February 30, 2021 never happened. '
           || CASE WHEN doc_id % 2 = 0
                THEN CAST(doc_id % 28 + 1 AS {s}) || ' March '
                     || CAST(2010 + doc_id % 8 AS {s}) || ' event. '
                ELSE '' END
           || CASE WHEN doc_id % 3 = 0
                THEN 'logged 2020-07-' || lpad(CAST(doc_id % 28 + 1
                     AS {s}), 2, '0') || ' end.'
                ELSE '' END AS text
    FROM documents"""


def q_date_mentions(spark, sf_dir):
    # prose date normalization (r6d, TIMEX absolute-date tier / SUTime
    # rule family): three frames + calendar validation via try_cast;
    # the Feb-30 decoy is planted in EVERY doc and must never emit.
    # Oracle enumerates mentions + make_date epochs closed-form.
    from augmented_codebase_indexer_spark.operators.datetx import (
        extract_dates,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return extract_dates(spark.sql(_datetx_pages_sql("spark")))


def _datetx_expected_sql() -> str:
    mon = " ".join(f"WHEN {i} THEN '{m}'"
                   for i, m in enumerate(_DTX_MONTHS))
    return f"""
    SELECT doc_id,
           CASE doc_id % 12 {mon} END || ' '
           || CAST(doc_id % 28 + 1 AS VARCHAR) || ', '
           || CAST(2001 + doc_id % 25 AS VARCHAR) AS mention,
           CAST(make_date(CAST(2001 + doc_id % 25 AS INTEGER),
                          CAST(doc_id % 12 + 1 AS INTEGER),
                          CAST(doc_id % 28 + 1 AS INTEGER))
                - DATE '1970-01-01' AS BIGINT) AS day_epoch,
           'mdy_text' AS fmt
    FROM documents
    UNION ALL
    SELECT doc_id,
           CAST(doc_id % 28 + 1 AS VARCHAR) || ' March '
           || CAST(2010 + doc_id % 8 AS VARCHAR),
           CAST(make_date(CAST(2010 + doc_id % 8 AS INTEGER), 3,
                          CAST(doc_id % 28 + 1 AS INTEGER))
                - DATE '1970-01-01' AS BIGINT),
           'dmy_text'
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id,
           '2020-07-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0'),
           CAST(make_date(2020, 7, CAST(doc_id % 28 + 1 AS INTEGER))
                - DATE '1970-01-01' AS BIGINT),
           'iso'
    FROM documents WHERE doc_id % 3 = 0"""


def _rule_triples_b_sql(dialect: str) -> str:
    """Snapshot B for the drift monitor: works_at's range drifts to
    cities on every 4th doc, lives_in vanishes, ceo_of appears."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT 's' || CAST(doc_id % 30 AS {s}) AS subj, 'works_at' AS pred,
           CASE WHEN doc_id % 4 = 0 THEN 'c' || CAST(doc_id % 5 AS {s})
                ELSE 'o' || CAST(doc_id % 12 AS {s}) END AS obj
    FROM documents
    UNION ALL
    SELECT 's' || CAST(doc_id % 30 AS {s}), 'employer',
           'o' || CAST(doc_id % 12 AS {s})
    FROM documents WHERE doc_id % 3 <> 0
    UNION ALL
    SELECT 's' || CAST(doc_id % 30 AS {s}), 'ceo_of',
           'o' || CAST(doc_id % 12 AS {s})
    FROM documents WHERE doc_id % 10 = 0"""


def q_schema_drift(spark, sf_dir):
    # per-predicate range drift between snapshots (r6d): exact L1 over
    # micro type-shares — works_at's planted city drift scores, the
    # stable employer scores ~0, lives_in reports 'gone', ceo_of 'new'.
    from augmented_codebase_indexer_spark.operators.schemadrift import (
        schema_drift,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return schema_drift(
        spark.sql(_rule_triples_sql("spark")),
        spark.sql(_rule_triples_b_sql("spark")),
        spark.sql(_kg_types_sql("spark")),
    )


def _alias_edges_sql(dialect: str) -> str:
    """Alias graph: every 'x' node links to exactly one typed hub
    (doc%5 rides inside doc%60), 'y' chains hang off even-residue x's,
    'z' off every 4th — so rounds 1/2/3 each assign a planted cohort —
    plus one two-hub tie node."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT 'x' || CAST(doc_id % 60 AS {s}) AS a,
           'h' || CAST(doc_id % 5 AS {s}) AS b FROM documents
    UNION ALL
    SELECT 'x' || CAST(doc_id % 60 AS {s}), 'y' || CAST(doc_id % 60 AS {s})
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT 'y' || CAST(doc_id % 60 AS {s}), 'z' || CAST(doc_id % 60 AS {s})
    FROM documents WHERE doc_id % 4 = 0
    UNION ALL
    SELECT 'tie', 'h0' FROM documents
    UNION ALL
    SELECT 'tie', 'h1' FROM documents"""


def _type_seeds_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT DISTINCT 'h' || CAST(doc_id % 5 AS {s}) AS entity,
           CASE doc_id % 5 WHEN 0 THEN 'person' WHEN 1 THEN 'org'
                WHEN 2 THEN 'city' WHEN 3 THEN 'person'
                ELSE 'org' END AS type
    FROM documents"""


def q_type_propagation(spark, sf_dir):
    # seeded type propagation (r6d, label spreading w/ clamping, Zhou
    # NIPS'03): untyped alias-graph fringe adopts the neighbor majority
    # per round, ties on type text, seeds clamped, 3-round horizon;
    # oracle unrolls the rounds as chained MATERIALIZED CTEs.
    from augmented_codebase_indexer_spark.operators.typeprop import (
        propagate_types,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return propagate_types(
        spark.sql(_alias_edges_sql("spark")),
        spark.sql(_type_seeds_sql("spark")), rounds=3)


def _microdata_pages_sql(dialect: str) -> str:
    """Planted flat microdata + OG markup (Spark executes; oracles
    enumerate closed-form): a Person item every doc, an Organization
    item every 5th, OG title/type pairs every doc."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT doc_id,
           '<div itemscope itemtype="https://schema.org/Person">'
           || '<meta itemprop="name" content="P'
           || CAST(doc_id % 50 AS {s}) || '">'
           || '<meta itemprop="jobTitle" content="title'
           || CAST(doc_id % 7 AS {s}) || '"></div>'
           || CASE WHEN doc_id % 5 = 0 THEN
                '<div itemscope itemtype="https://schema.org/Organization">'
                || '<meta itemprop="name" content="Org'
                || CAST(doc_id % 12 AS {s}) || '"></div>'
              ELSE '' END
           || '<meta property="og:title" content="Doc '
           || CAST(doc_id AS {s}) || '">'
           || '<meta property="og:type" content="article">' AS html
    FROM documents"""


def q_microdata_items(spark, sf_dir):
    # schema.org microdata, flat-scope tier (r6d): segment-split scope
    # binding (exact for non-nested markup), ordinal item index;
    # completes the three-syntax structured coverage with JSON-LD and
    # OG. Oracle enumerates closed-form, never parses.
    from augmented_codebase_indexer_spark.operators.microdata import (
        microdata_items,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return microdata_items(spark.sql(_microdata_pages_sql("spark")))


def q_og_meta(spark, sf_dir):
    # Open Graph page metadata (r6d, ogp.me): flat property/content
    # pairs, namespace-stripped.
    from augmented_codebase_indexer_spark.operators.microdata import og_meta

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return og_meta(spark.sql(_microdata_pages_sql("spark")))


def _microdata_expected_sql() -> str:
    return """
    SELECT doc_id, CAST(1 AS BIGINT) AS item_idx,
           'https://schema.org/Person' AS item_type,
           'name' AS prop, 'P' || CAST(doc_id % 50 AS VARCHAR) AS value
    FROM documents
    UNION ALL
    SELECT doc_id, 1, 'https://schema.org/Person', 'jobTitle',
           'title' || CAST(doc_id % 7 AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT doc_id, 2, 'https://schema.org/Organization', 'name',
           'Org' || CAST(doc_id % 12 AS VARCHAR)
    FROM documents WHERE doc_id % 5 = 0"""


def _og_expected_sql() -> str:
    return """
    SELECT doc_id, 'title' AS og_prop,
           'Doc ' || CAST(doc_id AS VARCHAR) AS content FROM documents
    UNION ALL
    SELECT doc_id, 'type', 'article' FROM documents"""


def _cusum_daily_sql(dialect: str) -> str:
    """Two daily-count series with a deterministic wiggle; s1 carries a
    +8 level shift from day 25 that no single day would flag."""
    idiv = "DIV" if dialect == "spark" else "//"
    return f"""
    WITH days AS (SELECT DISTINCT doc_id {idiv} 10 AS d FROM documents)
    SELECT 's0' AS series, d AS day, 10 + d % 3 AS cnt FROM days
    UNION ALL
    SELECT 's1', d,
           10 + d % 3 + CASE WHEN d >= 25 THEN 8 ELSE 0 END
    FROM days"""


def _negation_pages_sql() -> str:
    """Planted negated claims (closed-form oracle): one is_not_a every
    doc, is_no every 2nd, never every 3rd, denial every 5th, plus a
    positive copula decoy that must never match."""
    return """
    SELECT doc_id,
           'Item' || CAST(doc_id % 9 AS STRING) || ' is not a widget'
           || CAST(doc_id % 4 AS STRING) || '. '
           || CASE WHEN doc_id % 2 = 0 THEN
                'Brand' || CAST(doc_id % 7 AS STRING) || ' is no leader. '
              ELSE '' END
           || CASE WHEN doc_id % 3 = 0 THEN
                'Vendor' || CAST(doc_id % 5 AS STRING)
                || ' was never a partner. ' ELSE '' END
           || CASE WHEN doc_id % 5 = 0 THEN
                'Exec' || CAST(doc_id % 6 AS STRING)
                || ' denied being an insider. ' ELSE '' END
           || 'Acme is a company.' AS text
    FROM documents"""


def q_negated_claims(spark, sf_dir):
    # negation-guarded mining (r6d, NegEx tight scope): negated
    # membership claims as a suppression/refuting-vote relation —
    # extract the denial, never assert it. Closed-form oracle.
    from augmented_codebase_indexer_spark.operators.negation import (
        negated_assertions,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return negated_assertions(spark.sql(_negation_pages_sql()))


def _negation_expected_sql() -> str:
    return """
    SELECT doc_id, 'Item' || CAST(doc_id % 9 AS VARCHAR) AS subj,
           'is_a' AS pred,
           'widget' || CAST(doc_id % 4 AS VARCHAR) AS obj,
           'is_not_a' AS frame
    FROM documents
    UNION ALL
    SELECT doc_id, 'Brand' || CAST(doc_id % 7 AS VARCHAR), 'is_a',
           'leader', 'is_no'
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, 'Vendor' || CAST(doc_id % 5 AS VARCHAR), 'is_a',
           'partner', 'never'
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'Exec' || CAST(doc_id % 6 AS VARCHAR), 'is_a',
           'insider', 'denial'
    FROM documents WHERE doc_id % 5 = 0"""


def q_entity_fact_summary(spark, sf_dir):
    # entity cards (r6d, LinkSUM rarity tier): top-3 facts per subject
    # by predicate subject-frequency ascending; planned as
    # WindowGroupLimit so only k rows per subject survive the exchange.
    from augmented_codebase_indexer_spark.operators.factsummary import (
        entity_fact_summary,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return entity_fact_summary(
        spark.sql(_path_facts_sql("spark")), k=3)


def _kv_pages_sql() -> str:
    """Planted colon frames (closed-form oracle): a grouped population
    every doc, a plain-year every doc, a malformed-grouping decoy
    whose prefix digits parse (strict-grouping semantics), and a
    lowercase label that never matches."""
    return """
    SELECT doc_id,
           'Population: ' || CAST(1 + doc_id % 900 AS STRING) || ','
           || lpad(CAST(doc_id % 1000 AS STRING), 3, '0')
           || '. Founded: ' || CAST(1900 + doc_id % 120 AS STRING)
           || '. Malformed: 12,3' || CAST(doc_id % 10 AS STRING)
           || ' x. lowercase: 77.' AS text
    FROM documents"""


def q_kv_numeric_facts(spark, sf_dir):
    # infobox-style numeric KV mining (r6d): strict comma grouping OR
    # plain digit runs; value lands as exact BIGINT via regex-gated
    # replace+try_cast. Closed-form oracle.
    from augmented_codebase_indexer_spark.operators.kvfacts import (
        kv_numeric_facts,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return kv_numeric_facts(spark.sql(_kv_pages_sql()))


def _kv_expected_sql() -> str:
    return """
    SELECT doc_id, 'Population' AS key,
           CAST(1 + doc_id % 900 AS VARCHAR) || ','
           || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') AS raw,
           (1 + doc_id % 900) * 1000 + doc_id % 1000 AS value
    FROM documents
    UNION ALL
    SELECT doc_id, 'Founded', CAST(1900 + doc_id % 120 AS VARCHAR),
           1900 + doc_id % 120
    FROM documents
    UNION ALL
    SELECT doc_id, 'Malformed', '12', 12 FROM documents"""


def q_er_mutual_best(spark, sf_dir):
    # reciprocal-best decision tier (r6d): blocking -> Levenshtein
    # verification -> mutual-best selection, the full ER chain in one
    # gate; hub look-alikes (the cross-number near-names) lose their
    # non-reciprocated edges, exact duplicates win at distance 0.
    from augmented_codebase_indexer_spark.operators.mutualbest import (
        mutual_best_matches,
    )
    from augmented_codebase_indexer_spark.operators.nameblock import (
        block_candidates,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    cands = block_candidates(
        spark.sql(_er_names_sql("spark")), max_dist=2, block_cap=500)
    return mutual_best_matches(cands)


def q_er_canopy(spark, sf_dir):
    # canopy blocking (r6d, McCallum KDD'00): rare-token canopies over
    # the SAME name universe as er_name_blocking — the 'e' both-ends
    # variants the two-end keys provably miss share their number token
    # with the canonicals, so this tier recovers exactly that class
    # (the union-of-key-families story, each tier measured).
    from augmented_codebase_indexer_spark.operators.canopy import (
        canopy_candidates,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return canopy_candidates(spark.sql(_er_names_sql("spark")), max_df=10)


def q_score_drift_ks(spark, sf_dir):
    # two-sample KS (r6d): quality-score distribution of the corpus vs
    # a deterministically degraded build (junk tokens appended) — the
    # scorer-regression monitor; exact micro on the pooled
    # distinct-score grid.
    from augmented_codebase_indexer_spark.operators.changepoint import (
        ks_drift,
    )
    from augmented_codebase_indexer_spark.operators.textstats import (
        quality_micro_col,
    )

    d = _t(spark, sf_dir, "documents")
    a = d.select(quality_micro_col(F.col("text")).alias("score"))
    b = d.select(quality_micro_col(
        F.concat(F.col("text"), F.lit(" zz zz zz zz zz zz"))
    ).alias("score"))
    return ks_drift(a, b)


def q_slice_keywords(spark, sf_dir):
    # Fightin' Words log-odds (r6d): WHICH tokens distinguish src0
    # from src1 where slice_kl says only how far apart they are;
    # libm-free intlog chains over the shared vocab, sign = a-flavored.
    from augmented_codebase_indexer_spark.operators.corpusstats import (
        slice_log_odds,
    )

    return slice_log_odds(
        _t(spark, sf_dir, "documents"), "src0", "src1")


def q_source_concentration(spark, sf_dir):
    # corpus concentration (r6d): Gini + inverse-Simpson effective
    # sources + top share over per-source character mass — the
    # "how dominated is the corpus" health table, exact integers.
    from augmented_codebase_indexer_spark.operators.concentration import (
        concentration,
    )

    d = _t(spark, sf_dir, "documents")
    w = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("w"))
    return concentration(w, key_col="source", weight_col="w")


def q_qa_sample(spark, sf_dir):
    # deterministic review sampling (r6d): 5 hash-smallest facts per
    # predicate — exact quota, zero RNG state, WindowGroupLimit plan;
    # the weekly human-QA feed.
    from augmented_codebase_indexer_spark.operators.qasample import (
        stratified_sample,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return stratified_sample(
        spark.sql(_rule_triples_sql("spark")).distinct(),
        ["pred"], ["subj", "pred", "obj"], k=5)


def q_quality_calibration(spark, sf_dir):
    # reliability-diagram fold (r6d): does the surface quality score
    # predict exact-duplicate membership? Composes the gated
    # quality_micro expression with the md5 dup label over the real
    # corpus — fixed bucket edges so the gate is not a moving target.
    from augmented_codebase_indexer_spark.operators.calibration import (
        score_calibration,
    )

    return score_calibration(
        _quality_scored(spark, sf_dir), "score", "label")


def _quality_scored(spark, sf_dir):
    from augmented_codebase_indexer_spark.operators.textstats import (
        quality_micro_col,
    )

    d = _t(spark, sf_dir, "documents")
    dup = (
        d.select(F.md5("text").alias("h"))
        .groupBy("h").agg(F.count("*").cast("long").alias("k"))
    )
    return (
        d.select("text", F.md5("text").alias("h"))
        .join(dup, "h")
        .select(
            quality_micro_col(F.col("text")).alias("score"),
            (F.col("k") > 1).alias("label"),
        )
    )


def q_quality_auc(spark, sf_dir):
    # exact tie-corrected Mann-Whitney AUC (r6d): the threshold-free
    # "does this score separate the classes" number over the SAME
    # scored relation the calibration curve bins — doubled midranks
    # keep the gate BIGINT end-to-end.
    from augmented_codebase_indexer_spark.operators.calibration import (
        ranking_auc,
    )

    return ranking_auc(_quality_scored(spark, sf_dir), "score", "label")


def q_host_crawl_report(spark, sf_dir):
    # host crawl-health triage (r6d): the trap, politeness-drain and
    # budget screens — each its own oracle-gated operator — composed
    # into one host-grain report. h0 serves one content hash (trap);
    # even hosts carry planted Crawl-delays whose queues exceed the
    # 200 s window; odd hosts drain on the default delay.
    from augmented_codebase_indexer_spark.operators.budget import (
        crawl_budget,
    )
    from augmented_codebase_indexer_spark.operators.crawlreport import (
        host_crawl_report,
    )
    from augmented_codebase_indexer_spark.operators.schedule import (
        fetch_schedule,
        host_drain,
        parse_crawl_delays,
    )
    from augmented_codebase_indexer_spark.operators.traps import (
        url_alias_profile,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 6).cast("string"),
                    F.lit(".example"))
    url = F.concat(F.lit("https://"), host, F.lit("/p/"),
                   F.col("doc_id").cast("string"))
    fetches = d.select(
        url.alias("url"),
        F.when(F.col("doc_id") % 6 == 0, F.lit("trap-content"))
        .otherwise(F.md5(F.col("doc_id").cast("string")))
        .alias("content_hash"),
    )
    queue = d.select(
        url.alias("url"), host.alias("host"),
        (F.expr("doc_id DIV 6") + 1).cast("long").alias("slot"),
    )
    nl = "\n"
    robots = (
        d.select((F.col("doc_id") % 6).alias("h")).distinct()
        .select(
            F.concat(F.lit("h"), F.col("h").cast("string"),
                     F.lit(".example")).alias("domain"),
            F.when(
                F.col("h") % 2 == 0,
                F.concat(F.lit(f"User-agent: *{nl}Crawl-delay: "),
                         (F.col("h") + 2).cast("string")),
            ).otherwise(F.lit(f"User-agent: *{nl}Disallow: /x"))
            .alias("robots_txt"),
        )
    )
    sched = fetch_schedule(
        queue, parse_crawl_delays(robots),
        start_epoch_ms=1_700_000_000_000, default_delay_ms=1000)
    drain = host_drain(sched, window_ms=200_000)
    counts = queue.groupBy("host").agg(
        F.count("*").cast("long").alias("n_pages"))
    return host_crawl_report(
        url_alias_profile(fetches), drain,
        crawl_budget(counts, budget=100))


def _host_report_oracle_sql() -> str:
    from augmented_codebase_indexer_spark.operators.budget import (
        crawl_budget_oracle_sql,
    )
    from augmented_codebase_indexer_spark.operators.crawlreport import (
        host_crawl_report_oracle_sql,
    )
    from augmented_codebase_indexer_spark.operators.schedule import (
        fetch_schedule_oracle_sql,
        host_drain_oracle_sql,
    )
    from augmented_codebase_indexer_spark.operators.traps import (
        url_alias_profile_oracle_sql,
    )

    fetches = """
    SELECT 'https://h' || CAST(doc_id % 6 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS url,
           CASE WHEN doc_id % 6 = 0 THEN 'trap-content'
                ELSE md5(CAST(doc_id AS VARCHAR)) END AS content_hash
    FROM documents"""
    queue = """
    SELECT 'https://h' || CAST(doc_id % 6 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS url,
           'h' || CAST(doc_id % 6 AS VARCHAR) || '.example' AS host,
           doc_id // 6 + 1 AS slot
    FROM documents"""
    robots = """
    SELECT 'h' || CAST(h AS VARCHAR) || '.example' AS domain,
           CASE WHEN h % 2 = 0
                THEN 'User-agent: *' || chr(10) || 'Crawl-delay: '
                     || CAST(h + 2 AS VARCHAR)
                ELSE 'User-agent: *' || chr(10) || 'Disallow: /x'
           END AS robots_txt
    FROM (SELECT DISTINCT doc_id % 6 AS h FROM documents)"""
    sched = fetch_schedule_oracle_sql(
        queue, robots, agent="aci-bot",
        start_epoch_ms=1_700_000_000_000, default_delay_ms=1000)
    counts = (f"SELECT host, CAST(count(*) AS BIGINT) AS n_pages"
              f" FROM ({queue}) GROUP BY host")
    return host_crawl_report_oracle_sql(
        url_alias_profile_oracle_sql(fetches),
        host_drain_oracle_sql(sched, 200_000),
        crawl_budget_oracle_sql(counts, budget=100),
    )


def q_nav_paths(spark, sf_dir):
    # contiguous event-type trigrams per user (r6d, the AprioriAll
    # contiguous tier): the multi-step behavior mining next to the
    # memoryless transition matrix — real events table, min_count=3.
    from augmented_codebase_indexer_spark.operators.navpaths import (
        path_ngrams,
    )

    return path_ngrams(_t(spark, sf_dir, "events"), n=3, min_count=3)


def q_cusum_alarms(spark, sf_dir):
    # Page's CUSUM (r6d): the persistent-small-shift detector next to
    # the one-day burst screen; recursion rewritten as prefix-sum
    # minus running-min — two partitioned windows, all BIGINT.
    from augmented_codebase_indexer_spark.operators.changepoint import (
        cusum_alarms,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return cusum_alarms(spark.sql(_cusum_daily_sql("spark")),
                        h_micro=20_000_000)


def q_kg_pred_profile(spark, sf_dir):
    # AMIE functionality/cardinality profile (r6d): counts over the
    # deduped fact table + truncating micro divisions; the measurement
    # the SHACL-lite gate's functional constraints cite as evidence.
    from augmented_codebase_indexer_spark.operators.predprofile import (
        predicate_profile,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return predicate_profile(spark.sql(_rule_triples_sql("spark")))


def q_kg_schema_induction(spark, sf_dir):
    # domain/range induction (r6d, SDType-style): majority type per
    # predicate end with exact micro shares; bot noise stays minority,
    # one untyped org id and the region-typed city exercise absence
    # and minority paths.
    from augmented_codebase_indexer_spark.operators.typeinduction import (
        induce_domain_range,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return induce_domain_range(
        spark.sql(_rule_triples_sql("spark")),
        spark.sql(_kg_types_sql("spark")),
    )


def q_kg_schema_induction_incr(spark, sf_dir):
    # incremental induction (r6d, the paradedup increment contract):
    # the SAME documents processed as two arrival batches (parity
    # split, with heavy cross-batch fact overlap by construction)
    # through the seen-hash + algebraic-counts state machine — the
    # oracle is the ONE-SHOT induction mirror, so the gate IS the
    # batch-boundary-invariance theorem.
    from augmented_codebase_indexer_spark.operators.typeinduction import (
        induction_increment,
    )

    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents")
    types = spark.sql(_kg_types_sql("spark"))
    d.filter("doc_id % 2 = 0").createOrReplaceTempView("documents")
    b1 = spark.sql(_rule_triples_sql("spark"))
    _, st, seen = induction_increment(b1, types)
    d.filter("doc_id % 2 = 1").createOrReplaceTempView("documents")
    b2 = spark.sql(_rule_triples_sql("spark"))
    induced, _, _ = induction_increment(b2, types, state=st, seen=seen)
    d.createOrReplaceTempView("documents")
    return induced


def q_kg_type_violations(spark, sf_dir):
    # induced-schema violations (r6d): typed ends contradicting the
    # induced majority — bot subjects and region-typed city objects.
    from augmented_codebase_indexer_spark.operators.typeinduction import (
        induce_domain_range,
        type_violations,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    facts = spark.sql(_rule_triples_sql("spark"))
    types = spark.sql(_kg_types_sql("spark"))
    return type_violations(facts, types, induce_domain_range(facts, types))


def q_kg_schema_publish(spark, sf_dir):
    # the schema loop closed end-to-end (r6d): MEASURE types ->
    # INDUCE domain/range (SDType majority) -> PROMOTE to declarations
    # where both ends clear the evidence bar -> GATE publish with the
    # SHACL-lite conformance anti-join. No hand-written constraint
    # anywhere: the bot subjects, the untyped org and the region-typed
    # city are dropped by rules the pipeline learned from its own data.
    # Oracle nests the induction mirror as the declarations input of
    # the violations mirror under a NOT EXISTS anti-join.
    from augmented_codebase_indexer_spark.operators.kgquality import (
        domain_range_violations,
    )
    from augmented_codebase_indexer_spark.operators.typeinduction import (
        induce_domain_range,
        induced_declarations,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    facts = spark.sql(_rule_triples_sql("spark"))
    types = spark.sql(_kg_types_sql("spark")).distinct()
    decls = induced_declarations(induce_domain_range(facts, types))
    nt = types.select(
        F.col("entity").alias("node_id"), F.col("type").alias("node_type"))
    v = domain_range_violations(facts, nt, decls)
    return (
        facts.select("subj", "pred", "obj").distinct()
        .join(v.select("subj", "pred", "obj"),
              ["subj", "pred", "obj"], "left_anti")
    )


def _kg_schema_publish_oracle_sql() -> str:
    from augmented_codebase_indexer_spark.operators.kgquality import (
        domain_range_violations_sql,
    )
    from augmented_codebase_indexer_spark.operators.typeinduction import (
        induced_declarations_oracle_sql,
    )

    facts = _rule_triples_sql("duckdb")
    types = _kg_types_sql("duckdb")
    nt = (f"SELECT DISTINCT entity AS node_id, type AS node_type"
          f" FROM ({types})")
    v = domain_range_violations_sql(
        facts, nt, induced_declarations_oracle_sql(facts, types))
    return f"""
    WITH pub_v AS MATERIALIZED ({v}),
    f AS (SELECT DISTINCT subj, pred, obj FROM ({facts}))
    SELECT f.subj, f.pred, f.obj FROM f
    WHERE NOT EXISTS (
      SELECT 1 FROM pub_v v
      WHERE v.subj = f.subj AND v.pred = f.pred AND v.obj = f.obj)
    """


def _path_facts_sql(dialect: str) -> str:
    """Rule-mining facts plus an org hierarchy (o_k part_of o_{k DIV 2},
    depth ≤ 4) so bounded closure has real chains to saturate."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    idiv = "DIV" if dialect == "spark" else "//"
    return f"""{_rule_triples_sql(dialect)}
    UNION ALL
    SELECT DISTINCT 'o' || CAST(doc_id % 12 AS {s}), 'part_of',
           'o' || CAST((doc_id % 12) {idiv} 2 AS {s})
    FROM documents WHERE doc_id % 12 >= 1"""


_PATH_AST = ("alt",
             ("seq", ("pred", "works_at"),
              ("plus", ("pred", "part_of"), 4)),
             ("pred", "lives_in"))


def q_kg_property_paths(spark, sf_dir):
    # SPARQL property-path algebra (r6d, W3C SPARQL 1.1 §9): ONE AST
    # — works_at/part_of{1,4} | lives_in — compiled to DataFrame ops
    # AND to oracle SQL by the same compiler, so arbitrary path
    # queries stay oracle-gated without hand-written mirrors.
    from augmented_codebase_indexer_spark.operators.paths import eval_path

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return eval_path(spark.sql(_path_facts_sql("spark")), _PATH_AST)


def q_kg_rule_mining(spark, sf_dir):
    # AMIE-lite Horn rules (r6c): q(x,y) ⇒ p(x,y) with support, std
    # confidence AND the PCA confidence (partial completeness) — one
    # (s,o)-keyed self-join + one subject-keyed existence join, all
    # predicate-vocab²-sized after map-side combine.
    from augmented_codebase_indexer_spark.operators.rules import (
        mine_pair_rules,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return mine_pair_rules(spark.sql(_rule_triples_sql("spark")),
                           min_support=2)


def _sitemapindex_sql(dialect: str) -> str:
    """Closed-form sitemapindex xml per domain: two child sitemaps, the
    second without a lastmod; every 5th index has a junk lastmod."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    d = f"CAST(doc_id % 6 AS {s})"
    lm = (f"CASE WHEN doc_id % 5 = 0 THEN 'whenever' "
          f"ELSE '202' || CAST(doc_id % 4 AS {s}) || '-0' || "
          f"CAST(doc_id % 9 + 1 AS {s}) || '-1' || "
          f"CAST(doc_id % 10 AS {s}) END")
    return (
        f"SELECT 'https://d' || {d} || '.example/sitemap.xml' AS index_url, "
        f"'<sitemapindex><sitemap><loc>https://d' || {d} || "
        f"'.example/s' || CAST(doc_id % 8 AS {s}) || '.xml</loc>"
        f"<lastmod>' || {lm} || '</lastmod></sitemap>"
        f"<sitemap><loc>https://d' || {d} || '.example/s' || "
        f"CAST((doc_id + 1) % 8 AS {s}) || "
        "'.xml</loc></sitemap></sitemapindex>' AS xml "
        "FROM documents"
    )


def q_sitemap_index(spark, sf_dir):
    # sitemapindex parsing (r6c): the recursion level above urlset —
    # robots → sitemapindex → sitemap → changed-since; regex-parity
    # oracle over the same closed-form xml.
    from augmented_codebase_indexer_spark.operators.sitemaps import (
        parse_sitemapindex,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return parse_sitemapindex(spark.sql(_sitemapindex_sql("spark")))


def q_fertility_stats(spark, sf_dir):
    # tokenizer-fertility planning stats (r6c) over the REAL corpus,
    # sliced by source: bytes/chars/tokens per slice with
    # aggregate-then-divide micro ratios.
    from augmented_codebase_indexer_spark.operators.fertility import (
        fertility_stats,
    )

    return fertility_stats(
        _t(spark, sf_dir, "documents").selectExpr(
            "source AS lang", "text"),
    )


def _syndication_tables_sql(dialect: str) -> tuple[str, str]:
    """Star clusters over doc ids (members attach to their %4-floor
    hub) + deterministic fetch times with planted same-second ties."""
    div = "DIV" if dialect == "spark" else "//"
    pairs = f"""
    SELECT doc_id AS a, (doc_id {div} 4) * 4 AS b
    FROM documents WHERE doc_id % 4 <> 0"""
    fetches = """
    SELECT doc_id, CAST(1000000 + (doc_id * 37) % 1000 AS BIGINT)
             AS fetched_epoch
    FROM documents"""
    return pairs, fetches


def q_syndication_source(spark, sf_dir):
    # syndication origin attribution (r6c): dedup pairs → connected
    # components (existing min-label CC) → earliest-(epoch, id) origin
    # election per cluster; the temporal "who published first" layer
    # over near-dup clusters.
    from augmented_codebase_indexer_spark.operators.syndication import (
        syndication_origins,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    p_sql, f_sql = _syndication_tables_sql("spark")
    return syndication_origins(spark.sql(p_sql), spark.sql(f_sql))


def _canonical_pages_sql(dialect: str) -> str:
    """Pages over a 100-slot url grid with canonical CHAINS: slots
    %4=1,2 point one back, %4=3 two back — so %4∈{2,3} resolve in two
    hops to the %4=0 terminals; %4=0 declares nothing."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    i = f"(doc_id % 100)"
    tgt = (f"CASE WHEN {i} % 4 IN (1, 2) THEN {i} - 1 "
           f"WHEN {i} % 4 = 3 THEN {i} - 2 END")
    canon = (
        f"CASE WHEN {i} % 4 = 0 THEN '' "
        "ELSE '<link rel=\"canonical\" href=\"https://cc.example/p' || "
        f"CAST({tgt} AS {s}) || '\">' END"
    )
    return (
        f"SELECT 'https://cc.example/p' || CAST({i} AS {s}) AS url, "
        f"'<html><head><title>P' || CAST({i} AS {s}) || '</title>' || "
        f"{canon} || '</head></html>' AS html "
        "FROM documents"
    )


def q_canonical_resolve(spark, sf_dir):
    # canonical-chain resolution (r6c): page_meta extraction →
    # canonical edges → the existing pointer-doubling redirect
    # resolver; the oracle formulates the edge set independently from
    # the same arithmetic and runs the recursive-CTE mirror.
    from augmented_codebase_indexer_spark.operators.pagemeta import (
        canonical_edges,
        page_meta,
    )
    from augmented_codebase_indexer_spark.operators.redirects import (
        resolve_redirects,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    edges = canonical_edges(
        page_meta(spark.sql(_canonical_pages_sql("spark")))
    ).distinct()
    return resolve_redirects(edges)


def q_change_rates(spark, sf_dir):
    # Cho & Garcia-Molina page change-rate estimator (r6d): synthesized
    # fetch log — doc_id%6+1 intervals per url, content version
    # (k·(doc_id%4)) DIV 3 so X=0 / 0<X<n / X=n / single-visit branches
    # are all exercised; doc_id%13==0 urls get ONE visit (no info).
    # The intlog chain runs over the distinct (n, n−X) vocabulary only.
    from augmented_codebase_indexer_spark.operators.changerate import (
        change_rates,
    )

    log = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .selectExpr("doc_id", "explode(sequence(0, doc_id % 6 + 1)) AS k")
        .filter("NOT (doc_id % 13 = 0 AND k > 0)")
        .selectExpr(
            "concat('https://cc.example/p', CAST(doc_id AS STRING)) AS url",
            "1700000000 + k * (3600 + doc_id % 7) AS fetch_epoch",
            "md5(concat(CAST(doc_id AS STRING), ':',"
            " CAST((k * (doc_id % 4)) DIV 3 AS STRING))) AS content_hash",
        )
    )
    return change_rates(log)


def q_unigram_entropy(spark, sf_dir):
    # per-doc Shannon entropy of the token distribution (r6d): the
    # information-density screen between surface ratios and LM scores;
    # every ln from the libm-free intlog over the count vocabulary.
    from augmented_codebase_indexer_spark.operators.entropy import (
        unigram_entropy,
    )

    return unigram_entropy(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )


def q_fetch_schedule(spark, sf_dir):
    # politeness fetch scheduling (r6d): Crawl-delay parsed per domain
    # (exact-agent-else-* precedence, integer-ms assembly, junk → NULL
    # → default), composed with a slotted queue → fetch timestamps.
    # Delay cases planted per dnum%4: integer / exact-overrides-star
    # decimal / junk / absent.
    from augmented_codebase_indexer_spark.operators.schedule import (
        fetch_schedule,
        parse_crawl_delays,
    )
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").select("doc_id")
    host = F.concat(F.lit("site"), (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.com"))
    q0 = d.select(
        F.concat(F.lit("https://"), host, F.lit("/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        host.alias("host"),
    )
    queue = q0.withColumn(
        "slot",
        F.row_number().over(
            Window.partitionBy("host").orderBy("url")).cast("long"),
    )
    doms = d.select((F.col("doc_id") % 7).alias("dnum")).distinct()
    nl = "\n"
    robots = doms.select(
        F.concat(F.lit("site"), F.col("dnum").cast("string"),
                 F.lit(".example.com")).alias("domain"),
        F.when(F.col("dnum") % 4 == 0,
               F.lit(f"User-agent: *{nl}Crawl-delay: 2"))
        .when(F.col("dnum") % 4 == 1,
              F.lit(f"User-agent: *{nl}Crawl-delay: 0.5{nl}"
                    f"User-agent: aci-bot{nl}Crawl-delay: 3"))
        .when(F.col("dnum") % 4 == 2,
              F.lit(f"User-agent: *{nl}Crawl-delay: fast"))
        .otherwise(F.lit(f"User-agent: *{nl}Disallow: /x"))
        .alias("robots_txt"),
    )
    return fetch_schedule(
        queue, parse_crawl_delays(robots, agent="aci-bot"),
        start_epoch_ms=1_700_000_000_000, default_delay_ms=1000,
    )


def q_crawl_traps(spark, sf_dir):
    # crawl-trap detection (r6d): host h0 is a planted calendar trap
    # (every url serves ONE content hash); other hosts serve distinct
    # content; every 7th url on h1-h4 was refetched with changed
    # content (min-hash collapse keeps it one url).
    from augmented_codebase_indexer_spark.operators.traps import (
        url_alias_profile,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 5).cast("string"),
                    F.lit(".example"))
    url = F.concat(F.lit("https://"), host, F.lit("/p/"),
                   F.col("doc_id").cast("string"))
    first = d.select(
        url.alias("url"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("same-content"))
        .otherwise(F.md5(F.col("doc_id").cast("string")))
        .alias("content_hash"),
    )
    refetch = d.filter(
        (F.col("doc_id") % 5 != 0) & (F.col("doc_id") % 7 == 1)
    ).select(
        url.alias("url"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":v2")))
        .alias("content_hash"),
    )
    return url_alias_profile(first.unionByName(refetch))


def q_curation_funnel(spark, sf_dir):
    # the v3 chain's filter funnel — per-stage survivor counts in one row
    # (observability: no silent drops anywhere in the nightly pass)
    from augmented_codebase_indexer_spark.plans.curation import curation_funnel

    return curation_funnel(_t(spark, sf_dir, "documents"), decontam_n=3)


def q_decontam(spark, sf_dir):
    # benchmark decontamination: docs sharing a word n-gram with the eval
    # split are flagged; eval grams broadcast, corpus text never shuffled.
    # n=3 here because the synthetic vocab is tiny (≈40 words) — at web
    # scale the same operator runs with its default n=13.
    from augmented_codebase_indexer_spark.operators.decontam import decontaminate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = d.filter(F.col("doc_id") % 53 == 0)
    cands = d.filter(F.col("doc_id") % 53 != 0)
    return decontaminate(cands, eval_docs, n=3)


def q_decontam_spans(spark, sf_dir):
    # span-level decontamination: excise matching n-gram windows, keep the
    # rest of the page (doc-level dropping wastes long mostly-good pages)
    from augmented_codebase_indexer_spark.operators.decontam import decontaminate_spans

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return decontaminate_spans(
        d.filter(F.col("doc_id") % 53 != 0),
        d.filter(F.col("doc_id") % 53 == 0),
        n=3,
    )


def q_contam_report(spark, sf_dir):
    # eval-integrity report: per eval doc, how many corpus docs share an
    # n-gram with it and how many of its grams leaked (zeros included)
    from augmented_codebase_indexer_spark.operators.decontam import (
        contamination_report,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return contamination_report(
        d.filter(F.col("doc_id") % 53 != 0),
        d.filter(F.col("doc_id") % 53 == 0),
        n=3,
    )


def q_gopher_quality(spark, sf_dir):
    # Gopher-style per-rule quality verdicts, all JVM exprs, zero shuffle
    from augmented_codebase_indexer_spark.operators.textstats import gopher_quality_flags

    return gopher_quality_flags(_t(spark, sf_dir, "documents"))


def q_pii_redact(spark, sf_dir):
    # PII masking gate: inject deterministic fake PII (the corpus has none
    # by construction), redact, and hash the result — both engines build
    # the identical injected text, so the sha256 compare gates the regex
    # replacement semantics byte-for-byte.
    from augmented_codebase_indexer_spark.operators.pii import redact_pii

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"), did.cast("string"),
        F.lit("@mail.example.com from "),
        (did % 256).cast("string"), F.lit(".0.0."), (did % 100).cast("string"),
        F.lit(" call 555-"),
        F.lpad((did % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    red = redact_pii(d.select("doc_id", injected.alias("text")))
    return red.select(
        "doc_id", "n_email", "n_ipv4", "n_phone",
        F.sha2(F.col("clean_text"), 256).alias("clean_sha"),
    )


_MIX_BUDGETS = {"src0": 400, "src1": 700, "src2": 1000, "src3": 100000, "src4": 10}


def q_training_mix(spark, sf_dir):
    # deterministic data mixing: hash-ordered prefix per source under a
    # token budget (src3 = whole source, src4 = first-doc-only, the other
    # 15 sources dropped). One shuffle; no RNG state.
    from augmented_codebase_indexer_spark.operators.sampling import training_mix

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return training_mix(d, _MIX_BUDGETS)


def q_pack_sequences(spark, sf_dir):
    # training-batch assembly: pack token chunks into budget bins, sharded
    # by doc hash so no global-order window exists anywhere
    from augmented_codebase_indexer_spark.operators.chunking import chunk_documents
    from augmented_codebase_indexer_spark.operators.sampling import pack_sequences

    chunks = chunk_documents(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    return pack_sequences(chunks, budget=128, n_shards=8)


def q_domain_cap(spark, sf_dir):
    # per-domain quota (crawl balance): at most k docs per source, in
    # deterministic hash order — one window shuffle keyed by domain
    from augmented_codebase_indexer_spark.operators.sampling import domain_cap

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return domain_cap(d, k=7).select("doc_id", "source", "domain_rank")


def q_data_split(spark, sf_dir):
    # stable hash train/val/test split, aggregated per (source, split)
    from augmented_codebase_indexer_spark.operators.sampling import hash_split

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_toks")
    )
    return (
        hash_split(d)
        .groupBy("source", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )


def q_lm_vocab(spark, sf_dir):
    # the LM register table ITSELF, gated directly (VERDICT r5 Next #1a,
    # the hll_vocab precedent): (tok, lp_micro) for the doc_id%10
    # reference-slice unigram LM, log-probs via the libm-free fixed-point
    # integer log (functions/intlog.py). If lm_quality ever reds again,
    # this row bisects vocab-vs-aggregation from the artifact alone.
    from augmented_codebase_indexer_spark.operators.lmquality import (
        token_frame,
        unigram_logprobs,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    vocab, _ = unigram_logprobs(token_frame(d.filter(F.col("doc_id") % 10 == 0)))
    return vocab


def q_lm_quality(spark, sf_dir):
    # CCNet-style perplexity scoring: add-one unigram LM trained on the
    # doc_id%10 reference slice, per-doc cross-entropy in exact integer
    # micro-nats, head/middle/tail buckets. Narrow explode → guarded
    # broadcast vocab join → one combined row per doc over the exchange.
    from augmented_codebase_indexer_spark.operators.lmquality import lm_cross_entropy

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return lm_cross_entropy(d, d.filter(F.col("doc_id") % 10 == 0))


def q_dsir_weights(spark, sf_dir):
    # DSIR importance weights: per-doc log-likelihood ratio between a
    # target-domain LM (source=src0) and the raw-pool LM — positive
    # llr_per_tok_micro = "looks like the target domain". Exact BIGINT
    # sums and truncating integer division only — no float in the gate.
    from augmented_codebase_indexer_spark.operators.lmquality import dsir_log_ratio

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return dsir_log_ratio(
        d.select("doc_id", "text"),
        d.filter(F.col("source") == "src0").select("doc_id", "text"),
    )


def _entity_graph_sql(dialect: str) -> str:
    """Deterministic entity graph from doc_ids over 151 nodes: an affine
    family plus an integer-division family whose edge set GROWS with the
    corpus (doc_id//3 sweeps new residues as ids climb), so the graph
    densifies with SF instead of collapsing to a fixed modular pattern."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    div = "DIV" if dialect == "spark" else "//"
    return f"""
    SELECT CAST(doc_id % 151 AS {s}) AS src,
           CAST((doc_id * 13 + 5) % 151 AS {s}) AS dst
    FROM documents
    UNION ALL
    SELECT CAST(doc_id % 151 AS {s}),
           CAST((doc_id {div} 3) % 151 AS {s})
    FROM documents"""


def _token_paras_sql(dialect: str, w: int = 3) -> str:
    """Deterministic paragraph relation (doc_id, pidx, para) from the
    synthetic corpus: the token stream chopped into ``w``-token windows
    (the synthetic text has no newlines, so fixed windows stand in for
    real paragraph breaks; w=3 over the ~40-word vocab yields a
    realistic ~20% cross-doc duplicate rate at sf0.01)."""
    if dialect == "spark":
        return f"""
    WITH tok AS (
      SELECT doc_id,
             posexplode(filter(split(lower(text), ' '), t -> t <> ''))
               AS (pos, word)
      FROM documents)
    SELECT doc_id, CAST(pos DIV {w} AS BIGINT) AS pidx,
           array_join(transform(array_sort(collect_list(struct(pos, word))),
                                x -> x.word), ' ') AS para
    FROM tok GROUP BY doc_id, pos DIV {w}"""
    return f"""
    WITH tokl AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
      FROM documents),
    tok AS (
      SELECT doc_id, unnest(toks) AS word,
             CAST(unnest(range(0, len(toks))) AS BIGINT) AS pos
      FROM tokl)
    SELECT doc_id, pos // {w} AS pidx,
           string_agg(word, ' ' ORDER BY pos) AS para
    FROM tok GROUP BY doc_id, pos // {w}"""


def _ambiguous_anchors_sql(dialect: str) -> str:
    """Closed-form ambiguous anchor relation: every doc links 'brand K'
    to its majority sense /e/K, except docs ≡0 (mod 7), which use the
    same SURFACE FORM for a different target — the minority sense the
    commonness prior must rank second."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT CASE WHEN doc_id % 7 = 0
                THEN '/e/' || CAST((doc_id + 3) % 20 AS {s})
                ELSE '/e/' || CAST(doc_id % 20 AS {s}) END AS href,
           'Brand ' || CAST(doc_id % 20 AS {s}) AS anchor
    FROM documents"""


def _synonym_triples_sql(dialect: str) -> str:
    """Typed triples with a PLANTED predicate synonym: 'employer'
    duplicates works_at's extension on even doc_ids (a second extractor
    naming the same relation), while born_in stays disjoint — the
    alignment operator must flag exactly the planted pair; 'hq_org'
    (every 5th doc) shares a MINORITY of works_at's extension — a
    sub-threshold overlap row the gate must mark unaligned."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT 'e' || CAST(doc_id % 101 AS {s}) AS subj,
           'works_at' AS pred,
           'o' || CAST(doc_id % 7 AS {s}) AS obj
    FROM documents
    UNION ALL
    SELECT 'e' || CAST(doc_id % 101 AS {s}), 'employer',
           'o' || CAST(doc_id % 7 AS {s})
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT 'e' || CAST(doc_id % 101 AS {s}), 'hq_org',
           'o' || CAST(doc_id % 7 AS {s})
    FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT 'e' || CAST(doc_id % 101 AS {s}), 'born_in',
           'c' || CAST(doc_id % 5 AS {s})
    FROM documents"""


def _typed_triples_sql(dialect: str) -> str:
    """Deterministic typed triples from doc_ids: capital_of is
    functional-by-construction (object depends only on the subject),
    born_in is declared functional but DIRTY (object sweeps with
    doc_id//3, so recurring subjects accrete extra objects — planted
    violations), works_at is naturally multi-valued."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    div = "DIV" if dialect == "spark" else "//"
    return f"""
    SELECT CAST('e' || (doc_id % 101) AS {s}) AS subj,
           CASE doc_id % 3 WHEN 0 THEN 'capital_of'
                           WHEN 1 THEN 'born_in'
                           ELSE 'works_at' END AS pred,
           CASE doc_id % 3
             WHEN 0 THEN 'c' || ((doc_id % 101) % 11)
             WHEN 1 THEN 'c' || ((doc_id {div} 3) % 5)
             ELSE 'o' || (doc_id % 7) END AS obj
    FROM documents"""


def _typed_triples(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents")
    return spark.sql(_typed_triples_sql("spark"))


_AL = "'abcdefghijklmnopqrstuvwxyz'"


def _hearst_pages_sql() -> str:
    """Synthesized web-page text with planted Hearst constructions (same
    SQL runs in both dialects — but only Spark ever parses it; the
    oracle reconstructs the expected triples in closed form, no regex):
    a 3-item such-as list, an and-other sentence on even ids, an
    including sentence on ids ≡0 (mod 3), a 2-item especially list on
    ids ≡1 (mod 4), plus a lowercase 'things such as stuff' decoy that
    must NOT match (the NP anchor is capitalized)."""

    def L(n: int) -> str:
        return f"substr({_AL}, (doc_id % {n}) + 1, 1)"

    return f"""
    SELECT doc_id,
      'Cities such as P' || {L(11)} || ', Q' || {L(7)} || ' and R' || {L(5)}
        || ' are growing.'
      || CASE WHEN doc_id % 2 = 0
           THEN ' S' || {L(4)} || ' and other Fruits grow here.'
           ELSE ' Nothing special here.' END
      || CASE WHEN doc_id % 3 = 0
           THEN ' Rivers including T' || {L(13)} || ' flow fast.'
           ELSE '' END
      || CASE WHEN doc_id % 4 = 1
           THEN ' Tools, especially U' || {L(9)} || ' and V' || {L(6)}
                || ', help a lot.'
           ELSE '' END
      || ' things such as stuff happen.' AS text
    FROM documents"""


def q_hearst_isa(spark, sf_dir):
    # Hearst-pattern hypernym extraction (r5b, Hearst COLING'92): is_a
    # triples from the four classic lexico-syntactic patterns, one
    # narrow whole-stage-codegen scan, zero UDFs/shuffles. The oracle is
    # fully independent: it enumerates the planted triples in closed
    # form from doc_id arithmetic and never runs a regex.
    from augmented_codebase_indexer_spark.operators.hearst import (
        hearst_hypernyms,
    )

    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents")
    pages = spark.sql(_hearst_pages_sql())
    return hearst_hypernyms(pages)


def _hearst_expected_sql() -> str:
    def L(n: int) -> str:
        return f"substr({_AL}, (doc_id % {n}) + 1, 1)"

    branches = [
        (f"'P' || {L(11)}", "'Cities'", "'such_as'", ""),
        (f"'Q' || {L(7)}", "'Cities'", "'such_as'", ""),
        (f"'R' || {L(5)}", "'Cities'", "'such_as'", ""),
        (f"'S' || {L(4)}", "'Fruits'", "'and_other'", "WHERE doc_id % 2 = 0"),
        (f"'T' || {L(13)}", "'Rivers'", "'including'",
         "WHERE doc_id % 3 = 0"),
        (f"'U' || {L(9)}", "'Tools'", "'especially'", "WHERE doc_id % 4 = 1"),
        (f"'V' || {L(6)}", "'Tools'", "'especially'", "WHERE doc_id % 4 = 1"),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT doc_id, {hypo} AS hypo, 'is_a' AS pred, {hyper} AS hyper, "
        f"{pat} AS pattern FROM documents {where}"
        for hypo, hyper, pat, where in branches
    )


def _taxonomy_pages_sql() -> str:
    """3-level planted taxonomy per doc (leaves vary by doc_id letters;
    mid/root constant): Creatures ⊃ Animals ⊃ {Felines, Rodents} ⊃
    leaves. Only Spark parses this text; the oracle closes the
    closed-form edge list with its own recursive CTE."""

    def L(n: int) -> str:
        return f"substr({_AL}, (doc_id % {n}) + 1, 1)"

    return f"""
    SELECT doc_id,
      'Creatures such as Animals roam. '
      || 'Animals such as Felines and Rodents exist. '
      || 'Felines such as F' || {L(11)} || ' and F' || {L(7)} || ' hunt. '
      || 'Rodents including R' || {L(13)} || ' dig.' AS text
    FROM documents"""


def _taxonomy_edges_sql() -> str:
    def L(n: int) -> str:
        return f"substr({_AL}, (doc_id % {n}) + 1, 1)"

    return f"""
    SELECT 'Animals' AS hypo, 'Creatures' AS hyper FROM documents
    UNION ALL SELECT 'Felines', 'Animals' FROM documents
    UNION ALL SELECT 'Rodents', 'Animals' FROM documents
    UNION ALL SELECT 'F' || {L(11)}, 'Felines' FROM documents
    UNION ALL SELECT 'F' || {L(7)}, 'Felines' FROM documents
    UNION ALL SELECT 'R' || {L(13)}, 'Rodents' FROM documents"""


def q_taxonomy_closure(spark, sf_dir):
    # Hearst extraction feeding bounded transitive closure (r5b): the
    # ancestor set every leaf needs for type inference — leaves reach
    # Felines/Rodents at 1 hop, Animals at 2, Creatures at 3. Spark runs
    # the LIVE regex extraction then iterative frontier joins; the
    # oracle closes the closed-form edge list with WITH RECURSIVE — both
    # stages independently formulated.
    from augmented_codebase_indexer_spark.operators.hearst import (
        hearst_hypernyms,
    )
    from augmented_codebase_indexer_spark.operators.traversal import (
        taxonomy_closure,
    )

    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents")
    edges = hearst_hypernyms(spark.sql(_taxonomy_pages_sql())).select(
        "hypo", "hyper"
    )
    return taxonomy_closure(edges, max_hops=3)


def _fusion_assertions_sql(dialect: str) -> str:
    """Multi-source assertions with planted disagreement: sources s0-s9
    assert capital_of for every derived subject; s7-s9 are coordinated
    liars ('w…' objects). born_in is asserted by honest s0/s1 vs liars
    s7-s9 with 3:2 doc coverage, so per-subject the lie often wins the
    uniform vote and the re-trust rounds must flip it — iteration does
    real work on this corpus, it is not a fixed point of round 0."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    SELECT CAST('s' || (doc_id % 10) AS {s}) AS src,
           CAST('e' || (doc_id % 101) AS {s}) AS subj,
           'capital_of' AS pred,
           CAST(CASE WHEN (doc_id % 10) >= 7
                THEN 'w' || ((doc_id % 101) % 11)
                ELSE 'c' || ((doc_id % 101) % 11) END AS {s}) AS obj
    FROM documents
    UNION ALL
    SELECT CAST(CASE WHEN doc_id % 5 < 2 THEN 's' || (doc_id % 5)
                     ELSE 's' || ((doc_id % 5) + 5) END AS {s}) AS src,
           CAST('e' || (doc_id % 101) AS {s}) AS subj,
           'born_in' AS pred,
           CAST(CASE WHEN doc_id % 5 < 2 THEN 'b' || ((doc_id % 101) % 7)
                     ELSE 'z' || ((doc_id % 101) % 7) END AS {s}) AS obj
    FROM documents"""


def _fusion_assertions(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents")
    return spark.sql(_fusion_assertions_sql("spark"))


def q_kg_truth_fusion(spark, sf_dir):
    # multi-source conflict resolution (r5b, Knowledge Vault §5 /
    # TruthFinder): 2 fixed trust rounds, winner per (subj, pred) by
    # BIGINT micro-trust support, ties to smallest obj. All-integer gate;
    # the DuckDB oracle unrolls the same recurrence as a CTE chain with
    # row_number argmax — an independent formulation.
    from augmented_codebase_indexer_spark.operators.fusion import truth_fusion

    return truth_fusion(_fusion_assertions(spark, sf_dir), iters=2)


def q_kg_source_trust(spark, sf_dir):
    # per-source reliability after the same 2 rounds: (src, n_claims,
    # n_correct, trust_micro) — the liars' planted trust collapse is the
    # signal a production build alerts on.
    from augmented_codebase_indexer_spark.operators.fusion import source_trust

    return source_trust(_fusion_assertions(spark, sf_dir), iters=2)


_PUBLISH_NODE_TYPES_SQL = """
    SELECT 'e' || k AS node_id,
           CASE WHEN k % 2 = 0 THEN 'Person' ELSE 'City' END AS node_type
    FROM (SELECT DISTINCT doc_id % 101 AS k FROM documents)
    UNION ALL SELECT 'c' || j, 'City'
    FROM (SELECT DISTINCT doc_id % 11 AS j FROM documents)
    UNION ALL SELECT 'w' || j, 'Junk'
    FROM (SELECT DISTINCT doc_id % 11 AS j FROM documents)
    UNION ALL SELECT 'b' || j, 'City'
    FROM (SELECT DISTINCT doc_id % 7 AS j FROM documents)
    UNION ALL SELECT 'z' || j, 'Junk'
    FROM (SELECT DISTINCT doc_id % 7 AS j FROM documents)"""

_PUBLISH_DECLS_SQL = """
    SELECT 'capital_of' AS pred, 'City' AS domain_type, 'City' AS range_type
    UNION ALL SELECT 'born_in', 'Person', 'City'"""


def q_kg_publish(spark, sf_dir):
    # the publish-time chain composed end-to-end (r5b): multi-source
    # vote + re-trust picks one obj per fact, then the SHACL-lite
    # domain/range gate drops what fusion could not fix — liar values
    # ('w…'/'z…' objects, typed Junk) survive fusion only on liar-
    # dominated facts and are exactly the rows the QA anti-join removes,
    # along with parity-mismatched subjects. Deepest composed oracle on
    # the KG side: the fusion CTE chain nested as a subquery under the
    # conformance filter.
    from augmented_codebase_indexer_spark.operators.fusion import truth_fusion
    from augmented_codebase_indexer_spark.operators.kgquality import (
        domain_range_violations,
    )

    w = truth_fusion(_fusion_assertions(spark, sf_dir), iters=2)
    v = domain_range_violations(
        w.select("subj", "pred", "obj"),
        spark.sql(_PUBLISH_NODE_TYPES_SQL),
        spark.sql(_PUBLISH_DECLS_SQL),
    )
    return w.join(
        v.select("subj", "pred", "obj"), ["subj", "pred", "obj"], "left_anti"
    )


def q_kg_profile(spark, sf_dir):
    # per-predicate cardinality profile (r5, SHACL-lite QA): triple/
    # subject/object counts, max out-degree, functional_micro = integer
    # share of subjects with exactly one object — profile first, declare
    # constraints from evidence. All-BIGINT gate.
    from augmented_codebase_indexer_spark.operators.kgquality import (
        predicate_profile,
    )

    return predicate_profile(_typed_triples(spark, sf_dir))


def q_kg_functional_violations(spark, sf_dir):
    # declared-functional predicates with >1 distinct object per subject
    # (r5): the planted born_in violations must surface, the clean
    # capital_of must not.
    from augmented_codebase_indexer_spark.operators.kgquality import (
        functional_violations,
    )

    return functional_violations(
        _typed_triples(spark, sf_dir),
        functional_preds=("capital_of", "born_in"),
    )


_DR_NODE_TYPES_SQL = """
    SELECT 'e' || k AS node_id,
           CASE WHEN k % 2 = 0 THEN 'Person' ELSE 'City' END AS node_type
    FROM (SELECT DISTINCT doc_id % 101 AS k FROM documents)
    UNION ALL
    SELECT 'c' || j, 'City'
    FROM (SELECT DISTINCT doc_id % 11 AS j FROM documents)
    UNION ALL
    SELECT 'o' || j,
           CASE WHEN j % 2 = 0 THEN 'Org' ELSE 'School' END
    FROM (SELECT DISTINCT doc_id % 7 AS j FROM documents)"""

_DR_DECLS_SQL = """
    SELECT 'capital_of' AS pred, 'City' AS domain_type, 'City' AS range_type
    UNION ALL SELECT 'born_in', 'Person', 'City'
    UNION ALL SELECT 'works_at', 'Person', 'Org'"""


def q_kg_domain_range(spark, sf_dir):
    # SHACL-lite domain/range validation (r5b): typed triples checked
    # against a tiny ontology — even e-nodes are Person, odd are City,
    # odd o-nodes are School, so capital_of/born_in plant domain
    # violations by parity and works_at plants range violations. Same
    # all-string gate as the other kgquality entries.
    from augmented_codebase_indexer_spark.operators.kgquality import (
        domain_range_violations,
    )

    t = _typed_triples(spark, sf_dir)
    return domain_range_violations(
        t, spark.sql(_DR_NODE_TYPES_SQL), spark.sql(_DR_DECLS_SQL)
    )


def q_lang_id(spark, sf_dir):
    # content-based language ID (r5): per-language char-bigram LMs
    # trained relationally on the documents table's own labels, argmax
    # by exact BIGINT micro-nat sums, ties by language code — completes
    # the CCNet chain (LID -> LM quality -> DSIR) with no float in the
    # gate. langs passed explicitly so Spark and the oracle agree on the
    # column set regardless of discovery order.
    from augmented_codebase_indexer_spark.operators.langid import lang_id_ngram

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return lang_id_ngram(d, langs=["de", "en", "es", "fr", "zh"])


def q_lid_confusion(spark, sf_dir):
    # per-class P/R/F1 of the trained LID against the corpus labels
    # (r6d): the resubstitution-fit diagnostic for the CCNet chain's
    # first stage — F1 via the integer identity 2tp/(support+predicted)
    # so no float P/R composition exists; oracle nests the full LID
    # mirror (intlog chains included) under the confusion fold.
    from augmented_codebase_indexer_spark.operators.evaluation import (
        classification_report,
    )
    from augmented_codebase_indexer_spark.operators.langid import (
        lang_id_ngram,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pred = lang_id_ngram(
        d, langs=["de", "en", "es", "fr", "zh"]
    ).select("doc_id", "lang_pred")
    labeled = d.select("doc_id", "lang").join(pred, "doc_id")
    return classification_report(labeled, "lang", "lang_pred")


def q_slice_kl(spark, sf_dir):
    # pairwise KL divergence between source slices over the shared
    # smoothed vocabulary (r5): the mixing/drift diagnostic next to DSIR
    # — exact BIGINT micro-nat numerator + truncating division, no float
    # in the gate.
    from augmented_codebase_indexer_spark.operators.corpusstats import (
        slice_kl_divergence,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return slice_kl_divergence(d)


def q_zipf_profile(spark, sf_dir):
    # token-frequency head (r5): rank by (count desc, tok), integer-exact
    # cumulative share of the FULL corpus total; top-N planned as
    # TakeOrderedAndProject, the rank window bounded by N.
    from augmented_codebase_indexer_spark.operators.corpusstats import zipf_profile

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return zipf_profile(d, top_n=100)


_ROBOTS_STAR = ("User-agent: *\nDisallow: /p/1\nAllow: /p/12\n"
                "Disallow: /p/3$\n")
_ROBOTS_BOT = "User-agent: aci-bot\nDisallow: /p/2*7\n"


def q_robots_filter(spark, sf_dir):
    # robots.txt compliance (r5, RFC 9309): urls + per-domain robots
    # files synthesized deterministically from documents (7 domains;
    # even domains add an aci-bot group that then EXCLUDES the * group
    # per RFC); verdicts exercise longest-match, allow-override,
    # $ anchor, * wildcard, and group choice. All-string/bool/BIGINT gate.
    from augmented_codebase_indexer_spark.operators.robots import (
        apply_robots,
        parse_robots,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("https://site"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    doms = d.select((F.col("doc_id") % 7).alias("dnum")).distinct()
    robots = doms.select(
        F.concat(F.lit("site"), F.col("dnum").cast("string"),
                 F.lit(".example.com")).alias("domain"),
        F.when(F.col("dnum") % 2 == 0, F.lit(_ROBOTS_STAR + _ROBOTS_BOT))
        .otherwise(F.lit(_ROBOTS_STAR)).alias("robots_txt"),
    )
    return apply_robots(urls, parse_robots(robots), agent="aci-bot")


def q_url_canonical(spark, sf_dir):
    # URL canonicalization (r5, RFC 3986 §6 + tracking-param strip):
    # messy crawl-URL variants synthesized deterministically from doc_id
    # (uppercase host + :80 + utm params / unsorted query / https:443 +
    # fbclid / bare host with empty path) — every documented rule fires.
    from augmented_codebase_indexer_spark.operators.urlnorm import (
        with_canonical_url,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    base = F.concat(F.lit("site"), (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.com"))
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 4
    urls = d.select(
        "doc_id",
        F.when(m == 0, F.concat(F.lit("HTTP://"), F.upper(base),
                                F.lit(":80/p/"), sid,
                                F.lit("?utm_source=x&b=1#f")))
        .when(m == 1, F.concat(F.lit("http://"), base, F.lit("/p/"), sid,
                               F.lit("?z=2&a=1")))
        .when(m == 2, F.concat(F.lit("https://"), base, F.lit(":443/p/"),
                               sid, F.lit("?fbclid=1")))
        .otherwise(F.concat(F.lit("http://"), base)).alias("url"),
    )
    return with_canonical_url(urls)


def _cdx_line_cols(ts, status, off):
    # one CDXJ line as a single concat — byte-identical string built in
    # the SQL mirror, so the JSON tails parse to the same values
    d7 = (F.col("doc_id") % 7).cast("string")
    sid = F.col("doc_id").cast("string")
    return F.concat(
        F.lit("com,site"), d7, F.lit(")/p/"), sid, F.lit(" "),
        ts.cast("string"),
        F.lit(' {"url":"http://site'), d7, F.lit(".example.com/p/"), sid,
        F.lit('","status":"'), status,
        F.lit('","mime":"text/html","digest":"D'),
        (F.col("doc_id") % 13).cast("string"),
        F.lit('","filename":"w'), (F.col("doc_id") % 5).cast("string"),
        F.lit('.warc.gz","offset":"'), off.cast("string"),
        F.lit('","length":"100"}'),
    ).alias("line")


def q_cdx_latest(spark, sf_dir):
    # CDXJ capture selection (r5): two synthesized captures per doc (the
    # recrawl is newer but every 11th recrawl is a 404, so the original
    # wins there) -> newest-OK capture per url. Index-before-data: the
    # selection runs on slim index rows, one combined row per url over
    # the exchange.
    from augmented_codebase_indexer_spark.operators.cdx import (
        latest_ok_captures,
        parse_cdxj,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    base_ts = F.lit(20240101000000) + F.col("doc_id")
    first = d.select(_cdx_line_cols(
        base_ts, F.lit("200"), F.col("doc_id") * 100))
    second = d.select(_cdx_line_cols(
        base_ts + 1000000,
        F.when(F.col("doc_id") % 11 == 0, F.lit("404")).otherwise(F.lit("200")),
        F.col("doc_id") * 100 + 50,
    ))
    return latest_ok_captures(parse_cdxj(first.unionByName(second)))


def q_graph_triangles(spark, sf_dir):
    # degree-ordered triangle counting (Suri-Vassilvitskii orientation:
    # O(sqrt(m)) out-degree, hub-safe wedge join); the DuckDB oracle
    # closes wedges over the raw canonical edge list — an independent
    # enumeration of the same triangles
    from augmented_codebase_indexer_spark.operators.graphalgs import triangle_counts

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return triangle_counts(spark.sql(_entity_graph_sql("spark")))


def q_graph_jaccard(spark, sf_dir):
    # neighborhood Jaccard for pairs sharing >=2 neighbors — the
    # entity-resolution validation signal (duplicate entities have
    # near-identical neighborhoods)
    from augmented_codebase_indexer_spark.operators.graphalgs import jaccard_similarity

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return jaccard_similarity(spark.sql(_entity_graph_sql("spark")), min_common=2)


def q_graph_adamic_adar(spark, sf_dir):
    # Adamic-Adar link prediction: shared-neighbor sum of 1/ln(degree),
    # per-node weights quantized once to exact integer micro units
    from augmented_codebase_indexer_spark.operators.graphalgs import adamic_adar

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return adamic_adar(spark.sql(_entity_graph_sql("spark")), min_common=2)


def q_graph_robustness(spark, sf_dir):
    # attack tolerance (r6d, Albert-Jeong-Barabási Nature'00): remove
    # the top-10 hubs (degree desc, id tie-break — the DECISION is
    # deterministic), re-run CC over the survivors, report the giant
    # component's exact micro share. Isolated survivors count as
    # size-1 components in the denominator, not silently dropped.
    from augmented_codebase_indexer_spark.operators.graphalgs import (
        attack_tolerance,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return attack_tolerance(spark.sql(_entity_graph_sql("spark")), k=10)


def _graph_robustness_oracle_sql() -> str:
    return f"""
    WITH RECURSIVE raw AS (
      SELECT src, dst FROM ({_entity_graph_sql("duckdb")})
      WHERE src <> dst),
    und AS (SELECT DISTINCT least(src, dst) AS a,
                   greatest(src, dst) AS b FROM raw),
    -- DISTINCT over UNION ALL, never bare UNION: inside a WITH
    -- RECURSIVE clause DuckDB parses a CTE's top-level UNION as the
    -- recursive union operator and skips the dedup (measured: 151
    -- nodes became 1182)
    nodes AS (SELECT DISTINCT id FROM (
      SELECT a AS id FROM und UNION ALL SELECT b FROM und)),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
              SELECT a AS node FROM und UNION ALL SELECT b FROM und)
            GROUP BY node),
    hubs AS (SELECT node FROM deg ORDER BY deg DESC, node LIMIT 10),
    survivors AS (
      SELECT id FROM nodes WHERE id NOT IN (SELECT node FROM hubs)),
    kept AS MATERIALIZED (
      SELECT a, b FROM und
      WHERE a NOT IN (SELECT node FROM hubs)
        AND b NOT IN (SELECT node FROM hubs)),
    edges AS (SELECT DISTINCT src, dst FROM (
      SELECT a AS src, b AS dst FROM kept
      UNION ALL SELECT b, a FROM kept)),
    cc AS (
      SELECT id, id AS label FROM survivors
      UNION
      SELECT e.dst AS id, c.label FROM cc c JOIN edges e
        ON e.src = c.id),
    comp AS (SELECT id, min(label) AS component FROM cc GROUP BY id),
    sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS size
              FROM comp GROUP BY component)
    SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST(10 AS BIGINT) AS n_removed,
           CAST((SELECT count(*) FROM survivors) AS BIGINT)
             AS n_survivors,
           CAST(max(size) AS BIGINT) AS max_component,
           CAST(max(size) AS BIGINT) * 1000000
             // (SELECT count(*) FROM survivors) AS giant_share_micro
    FROM sizes
    """


def q_graph_assortativity(spark, sf_dir):
    # degree assortativity (r6d, Newman 2002): one-number structure
    # screen — raw BIGINT moment sums reported next to the micro ratio
    # so the gate is auditable; regular graphs yield NULL, not a
    # division error.
    from augmented_codebase_indexer_spark.operators.graphalgs import (
        assortativity,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return assortativity(spark.sql(_entity_graph_sql("spark")))


def q_graph_ktruss(spark, sf_dir):
    # k-truss backbone (r6d, Cohen '08): edge-grain tightening of the
    # k-core — peels wedge-uncorroborated (extraction-noise-shaped)
    # edges the core keeps; unique fixpoint, oracle unrolled 20 rounds.
    from augmented_codebase_indexer_spark.operators.graphalgs import k_truss

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return k_truss(spark.sql(_entity_graph_sql("spark")), k=3)


def q_graph_cocitation(spark, sf_dir):
    # co-citation relatedness (r6d, Small JASIS'73): destination pairs
    # by Jaccard over citer sets — direction IS the signal vs the
    # undirected neighborhood Jaccard.
    from augmented_codebase_indexer_spark.operators.cocitation import (
        cocitation,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return cocitation(spark.sql(_entity_graph_sql("spark")), min_common=2)


def q_graph_coupling(spark, sf_dir):
    # bibliographic coupling (r6d, Kessler '63): source pairs by
    # Jaccard over cited sets — the shared-sources screen at link
    # level (syndication candidates).
    from augmented_codebase_indexer_spark.operators.cocitation import (
        coupling,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return coupling(spark.sql(_entity_graph_sql("spark")), min_common=2)


def q_graph_kcore(spark, sf_dir):
    # k-core backbone: iterative degree-< k peeling to the unique
    # fixpoint; the oracle peels with 20 unrolled fixed rounds — same
    # fixpoint, independently iterated
    from augmented_codebase_indexer_spark.operators.graphalgs import k_core

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return k_core(spark.sql(_entity_graph_sql("spark")), k=6)


_TEMPORAL_PRED_CASE = """CASE doc_id % 6
      WHEN 0 THEN 'acquired' WHEN 1 THEN 'founded_by' WHEN 2 THEN 'located_in'
      WHEN 3 THEN 'partnered_with' WHEN 4 THEN 'subsidiary_of' ELSE 'works_for'
    END"""

# epoch-second crawl times: doc_id-monotone, int64 end-to-end. The object
# steps every ~2 observations per (subj, pred) class so SCD2 produces
# real multi-version histories (runs of ~2) rather than one run per key.
_TEMPORAL_FACTS_SQL = f"""
    SELECT 'Entity' || CAST(doc_id % 50 AS VARCHAR) AS subj,
           {_TEMPORAL_PRED_CASE} AS pred,
           'V' || CAST((doc_id % 50 + doc_id // 300) % 7 AS VARCHAR) AS obj,
           CAST(1700000000 + doc_id * 37 AS BIGINT) AS ts
    FROM documents"""

_TEMPORAL_AS_OF = 1700000000 + 37 * 250  # mid-history at the driver's sf


def _temporal_facts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    return d.select(
        F.concat(F.lit("Entity"), (did % 50).cast("string")).alias("subj"),
        F.expr(_TEMPORAL_PRED_CASE).alias("pred"),
        F.concat(
            F.lit("V"), ((did % 50 + F.floor(did / 300)) % 7).cast("string")
        ).alias("obj"),
        (F.lit(1700000000) + did * 37).cast("long").alias("ts"),
    )


def _conflict_facts_sql(dialect: str, source: str) -> str:
    """Two crawl sources asserting timestamped facts: B disagrees with
    A on born_in for every 4th subject (open-ended conflict) and
    switches capital_of's object mid-history (bounded-overlap
    conflict); works_at is multi-valued and stays out of the
    functional policy."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    idiv = "DIV" if dialect == "spark" else "//"
    r40 = f"doc_id % 40"
    b = f"doc_id {idiv} 40"
    born_obj = (
        f"CASE WHEN {r40} % 4 = 0 THEN 'c' || CAST(({r40} + 1) % 7 AS {s})"
        f" ELSE 'c' || CAST({r40} % 7 AS {s}) END"
        if source == "b" else f"'c' || CAST({r40} % 7 AS {s})")
    cap_obj = (
        f"CASE WHEN {b} >= 5 THEN 'x1' ELSE 'x0' END"
        if source == "b" else "'x0'")
    return f"""
    SELECT 'E' || CAST({r40} AS {s}) AS subj, 'born_in' AS pred,
           {born_obj} AS obj,
           CAST(1700000000 + ({b}) * 1000 AS BIGINT) AS ts
    FROM documents
    UNION ALL
    SELECT 'K' || CAST(doc_id % 10 AS {s}), 'capital_of', {cap_obj},
           CAST(1700000000 + ({b}) * 1000 AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'E' || CAST({r40} AS {s}), 'works_at',
           'o' || CAST(doc_id % 3 AS {s}),
           CAST(1700000000 + ({b}) * 1000 AS BIGINT)
    FROM documents"""


def q_temporal_conflicts(spark, sf_dir):
    # time-aware functional violations (r6d): SCD2 each source, union,
    # detect overlapping different-object versions of functional preds
    # — every row a cross-source disagreement with the disputed window
    # attached (within-source versions are disjoint by construction).
    # Oracle composes the scd2 mirror per source under the conflict
    # join.
    from augmented_codebase_indexer_spark.operators.temporal import (
        scd2_intervals,
        temporal_conflicts,
    )

    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    va = scd2_intervals(spark.sql(_conflict_facts_sql("spark", "a")))
    vb = scd2_intervals(spark.sql(_conflict_facts_sql("spark", "b")))
    return temporal_conflicts(
        va.unionByName(vb), ["born_in", "capital_of"])


def q_triples_scd2(spark, sf_dir):
    # temporal KG: SCD2 validity intervals per (subj, pred) over
    # crawl-timestamped facts — gaps-and-islands, ONE entity-key shuffle
    from augmented_codebase_indexer_spark.operators.temporal import scd2_intervals

    return scd2_intervals(_temporal_facts(spark, sf_dir))


def q_kg_snapshot(spark, sf_dir):
    # "the graph as of T": narrow filter over the SCD2 frame
    from augmented_codebase_indexer_spark.operators.temporal import (
        scd2_intervals,
        snapshot_asof,
    )

    return snapshot_asof(
        scd2_intervals(_temporal_facts(spark, sf_dir)), _TEMPORAL_AS_OF
    )


_TEMPORAL_T2 = 1700000000 + 37 * 450


def q_kg_snapshot_diff(spark, sf_dir):
    # time-travel diff: what changed between two snapshots — the J1
    # incremental-diff shape applied to the temporal dimension
    from augmented_codebase_indexer_spark.operators.temporal import (
        scd2_intervals,
        snapshot_diff,
    )

    return snapshot_diff(
        scd2_intervals(_temporal_facts(spark, sf_dir)),
        _TEMPORAL_AS_OF,
        _TEMPORAL_T2,
    )


def q_exactsubstr_spans(spark, sf_dir):
    # ExactSubstr cross-document substring excision (Lee et al. 2021):
    # n-token windows repeated verbatim in ≥2 distinct docs are excised
    # everywhere except the min-doc_id owner. n=8 for the tiny synthetic
    # vocab (published setting is 50 at web scale).
    from augmented_codebase_indexer_spark.operators.exactsubstr import (
        exact_substr_spans,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_substr_spans(d, n=8, min_df=2)


def _url_expr(dialect: str) -> str:
    """Deterministic synthetic-crawl URLs from doc_id/source — identical
    CASE on both engines; exercises subdomains, multi-label suffixes,
    platform suffixes, ports, userinfo, IPs, trailing dots, and
    single-label intranet hosts."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    c = f"CAST(doc_id AS {s})"
    m = f"CAST(doc_id % 250 AS {s})"
    return f"""CASE doc_id % 7
      WHEN 0 THEN 'https://www.example.com/a/' || {c}
      WHEN 1 THEN 'http://blog.shop.co.uk:8080/p?id=' || {c}
      WHEN 2 THEN 'https://user:pw@' || source || '.blogspot.com/x'
      WHEN 3 THEN 'http://192.168.4.' || {m} || '/index.html'
      WHEN 4 THEN 'https://' || source || '.github.io/repo/' || {c}
      WHEN 5 THEN 'https://deep.sub.example.org./t'
      ELSE 'http://single-label/x' END"""


def q_domain_normalize(spark, sf_dir):
    # URL → host → eTLD+1 registered domain (narrow JVM exprs, zero
    # shuffle) — the normalization that makes domain_cap un-gameable by
    # subdomain spam
    from augmented_codebase_indexer_spark.operators.domains import with_domain

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_url_expr("spark")).alias("url")
    )
    return with_domain(d).select("doc_id", "url", "host", "domain")


def q_domain_cap_url(spark, sf_dir):
    # the composition the normalization exists for: per-REGISTERED-domain
    # quota over raw crawl URLs (blogspot subdomains are separate
    # registrants; example.com subdomains collapse and get capped)
    from augmented_codebase_indexer_spark.operators.domains import with_domain
    from augmented_codebase_indexer_spark.operators.sampling import domain_cap

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_url_expr("spark")).alias("url")
    )
    return domain_cap(with_domain(d), k=3, domain_col="domain").select(
        "doc_id", "domain", "domain_rank"
    )


def q_sessionize(spark, sf_dir):
    # gap-based sessionization (two shared-partition windows, one shuffle)
    from augmented_codebase_indexer_spark.operators.sessions import session_stats

    return session_stats(_t(spark, sf_dir, "events"), gap_seconds=1800)


def q_asof_join(spark, sf_dir):
    # as-of join via union + carry-forward window (one shuffle; the DuckDB
    # oracle uses its NATIVE ASOF JOIN — an independent implementation)
    from augmented_codebase_indexer_spark.operators.sessions import asof_join

    e = _t(spark, sf_dir, "events")
    dim = e.filter(F.col("event_type") == "signup").select("user_id", "ts", "value")
    evs = e.filter(F.col("event_type") != "signup")
    return asof_join(evs, dim, key_col="user_id").select(
        "event_id", F.round("asof_value", 6).alias("asof_value")
    )


def q_artifact_search(spark, sf_dir):
    # F7 artifact_type filter over the C6 multi-granularity table
    from augmented_codebase_indexer_spark.operators.summary import artifact_table
    from augmented_codebase_indexer_spark.plans.search import artifact_search

    art = artifact_table(_t(spark, sf_dir, "documents"), size=40, overlap=10)
    return artifact_search(art, "spark window join", k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """ORDER MATTERS: the driver's correctness artifact covers the FIRST
    50 entries only, so the window leads with (a) the 32 new/changed
    entries — lm_vocab + the intlog sweep (VERDICT r5 Next #1: lp_micro
    / oov / idf_micro / kl lp / AA w_micro now come from the libm-free
    fixed-point BIGINT log), curation_v6 (trained LID), asset_metadata
    (new JPEG case), and the 19 r6 operators (bm25_search … graph_walks,
    paragraph_dedup, lpa_communities, kg_bgp_match, mention_commonness,
    daily_bursts, kg_negatives, walk_skipgrams, graph_hits,
    predicate_alignment, clustering_coeff, audio/video_metadata,
    kg_literals, allen_relations, snippet_search, robots_sitemaps) —
    NEVER-driver-checked oracles outrank stale-but-once-green ones; then
    (b) the oldest r3-stale entries fill to the 50-line (VERDICT r5
    Next #3 rotation; the 12 displaced r3-stale entries and the r4 block
    lead r7's rotation queue). Everything below the line is
    r3/r4/r5-driver-green and unchanged; ``scripts/selfcheck.py`` still
    runs ALL of them."""
    return {
        # --- (a) r6: new + intlog-swept gated outputs ---
        "lm_vocab": q_lm_vocab,
        "lm_quality": q_lm_quality,
        "dsir_weights": q_dsir_weights,
        "lang_id": q_lang_id,
        "slice_kl": q_slice_kl,
        "tfidf_keywords": q_tfidf_keywords,
        "graph_adamic_adar": q_graph_adamic_adar,
        "curation_v6": q_curation_v6,
        "asset_metadata": q_asset_metadata,
        "bm25_search": q_bm25_search,
        "er_matches": q_er_matches,
        "proximity_search": q_proximity_search,
        "graph_walks": q_graph_walks,
        "paragraph_dedup": q_paragraph_dedup,
        "lpa_communities": q_lpa_communities,
        "kg_bgp_match": q_kg_bgp_match,
        "mention_commonness": q_mention_commonness,
        "daily_bursts": q_daily_bursts,
        "kg_negatives": q_kg_negatives,
        "walk_skipgrams": q_walk_skipgrams,
        "graph_hits": q_graph_hits,
        "predicate_alignment": q_predicate_alignment,
        "clustering_coeff": q_clustering_coeff,
        "audio_metadata": q_audio_metadata,
        "video_metadata": q_video_metadata,
        "kg_literals": q_kg_literals,
        "allen_relations": q_allen_relations,
        "snippet_search": q_snippet_search,
        "robots_sitemaps": q_robots_sitemaps,
        "event_funnel": q_event_funnel,
        # --- (a2) r6c: this session's additions (never driver-checked) ---
        "retention_cohorts": q_retention_cohorts,
        "event_transitions": q_event_transitions,
        "readability": q_readability,
        "collocations": q_collocations,
        "url_param_rules": q_url_param_rules,
        "host_boilerplate": q_host_boilerplate,
        "entity_salience": q_entity_salience,
        "span_coverage": q_span_coverage,
        "extractor_kappa": q_extractor_kappa,
        "webtable_types": q_webtable_types,
        "kg_shortest_paths": q_kg_shortest_paths,
        "wlm_relatedness": q_wlm_relatedness,
        "kg_symmetry": q_kg_symmetry,
        "host_lang_profile": q_host_lang_profile,
        "page_meta": q_page_meta,
        "heading_outline": q_heading_outline,
        "retrieval_triplets": q_retrieval_triplets,
        "entity_disambig": q_entity_disambig,
        "crawl_budget": q_crawl_budget,
        "url_path_rollup": q_url_path_rollup,
        "rake_keyphrases": q_rake_keyphrases,
        "hreflang_recip": q_hreflang_recip,
        "host_link_profile": q_host_link_profile,
        "kg_rule_mining": q_kg_rule_mining,
        "sitemap_index": q_sitemap_index,
        "fertility_stats": q_fertility_stats,
        "syndication_source": q_syndication_source,
        "canonical_resolve": q_canonical_resolve,
        # --- (a3) r6d: this session's additions (r7 rotation queue) ---
        "change_rates": q_change_rates,
        "unigram_entropy": q_unigram_entropy,
        "fetch_schedule": q_fetch_schedule,
        "crawl_traps": q_crawl_traps,
        "kg_pred_profile": q_kg_pred_profile,
        "kg_schema_induction": q_kg_schema_induction,
        "kg_type_violations": q_kg_type_violations,
        "kg_schema_induction_incr": q_kg_schema_induction_incr,
        "kg_completeness": q_kg_completeness,
        "quote_attribution": q_quote_attribution,
        "er_name_blocking": q_er_name_blocking,
        "er_blocking_quality": q_er_blocking_quality,
        "vocab_growth": q_vocab_growth,
        "acronym_pairs": q_acronym_pairs,
        "kg_schema_publish": q_kg_schema_publish,
        "geo_candidates": q_geo_candidates,
        "date_mentions": q_date_mentions,
        "graph_cocitation": q_graph_cocitation,
        "graph_coupling": q_graph_coupling,
        "graph_assortativity": q_graph_assortativity,
        "lid_confusion": q_lid_confusion,
        "schema_drift": q_schema_drift,
        "type_propagation": q_type_propagation,
        "microdata_items": q_microdata_items,
        "og_meta": q_og_meta,
        "graph_ktruss": q_graph_ktruss,
        "temporal_conflicts": q_temporal_conflicts,
        "kg_property_paths": q_kg_property_paths,
        "cusum_alarms": q_cusum_alarms,
        "negated_claims": q_negated_claims,
        "nav_paths": q_nav_paths,
        "entity_fact_summary": q_entity_fact_summary,
        "host_crawl_report": q_host_crawl_report,
        "quality_calibration": q_quality_calibration,
        "kv_numeric_facts": q_kv_numeric_facts,
        "qa_sample": q_qa_sample,
        "er_canopy": q_er_canopy,
        "quality_auc": q_quality_auc,
        "score_drift_ks": q_score_drift_ks,
        "source_concentration": q_source_concentration,
        "er_mutual_best": q_er_mutual_best,
        "slice_keywords": q_slice_keywords,
        "graph_robustness": q_graph_robustness,
        # --- (b) last driver row r3 (30 entries, oldest first) ---
        "pagerank": q_pagerank,
        "traverse": q_traverse,
        "topo_layers": q_topo_layers,
        "incremental_diff": q_incremental_diff,
        "interval_antijoin": q_interval_antijoin,
        "sessionize": q_sessionize,
        "hybrid_search": q_hybrid_search,
        "artifact_search": q_artifact_search,
        "q1_pricing_summary": q1_pricing_summary,
        "join_topk_revenue": q_join_topk_revenue,
        "event_window": q_event_window,
        "window_dedup": q_window_dedup,
        "rrf_fuse": q_rrf_fuse,
        "percentiles": q_percentiles,
        "lang_stats": q_lang_stats,
        "distinct_sources": q_distinct_sources,
        "topk_docs": q_topk_docs,
        "set_ops": q_set_ops,
        "group_collect": q_group_collect,
        "sha_hash": q_sha_hash,
        # ------ driver 50-entry window ends here (#50 = sha_hash) ---
        "fingerprint": q_fingerprint,
        "mrr": q_mrr,
        "score_normalize": q_score_normalize,
        "outer_join_histogram": q_outer_join_histogram,
        "having_filter": q_having_filter,
        "cube_stats": q_cube_stats,
        "semi_join": q_semi_join,
        "pattern_search": q_pattern_search,
        "summaries": q_summaries,
        "outlinks": q_outlinks,
        # --- (c) last driver row r4, oldest-listed first ---
        "curation_funnel": q_curation_funnel,
        "ppr": q_ppr,
        "exactsubstr_spans": q_exactsubstr_spans,
        "decontam": q_decontam,
        "decontam_spans": q_decontam_spans,
        "gopher_quality": q_gopher_quality,
        "triples_scd2": q_triples_scd2,
        # --- r4-green remainder (next rotation's candidates) ---
        "kg_snapshot": q_kg_snapshot,
        "kg_snapshot_diff": q_kg_snapshot_diff,
        "graph_triangles": q_graph_triangles,
        "graph_kcore": q_graph_kcore,
        "domain_normalize": q_domain_normalize,
        "domain_cap_url": q_domain_cap_url,
        "contam_report": q_contam_report,
        "pii_redact": q_pii_redact,
        "training_mix": q_training_mix,
        "pack_sequences": q_pack_sequences,
        "domain_cap": q_domain_cap,
        "data_split": q_data_split,
        "asof_join": q_asof_join,
        "moving_avg": q_moving_avg,
        "pivot_counts": q_pivot_counts,
        "profile": q_profile,
        "kg_extract_text": q_kg_extract_text,
        "kg_triples": q_kg_triples,
        "kg_mentions": q_kg_mentions,
        "kg_mentions_joins": q_kg_mentions_joins,
        "kg_node_degree": q_kg_node_degree,
        "boilerplate_prune": q_boilerplate_prune,
        "repetition_stats": q_repetition_stats,
        "chunking": q_chunking,
        "chunking_sentence": q_chunking_sentence,
        "near_dedup_winners": q_near_dedup_winners,
        "cluster_cap": q_cluster_cap,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_exact": q_dedup_exact,
        "dedup_embedding": q_dedup_embedding,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "ann_topk": q_ann_topk,
        # --- r5-driver-green, unchanged this round ---
        "anchor_profile": q_anchor_profile,
        "redirect_resolve": q_redirect_resolve,
        "comention_pmi": q_comention_pmi,
        "phrase_search": q_phrase_search,
        "dedup_containment": q_dedup_containment,
        "crawl_frontier": q_crawl_frontier,
        "kg_volatility": q_kg_volatility,
        "graph_reciprocity": q_graph_reciprocity,
        "jsonld_items": q_jsonld_items,
        "web_tables": q_web_tables,
        "sitemap_recrawl": q_sitemap_recrawl,
        "kg_multisource": q_kg_multisource,
        "crawl_novelty": q_crawl_novelty,
        "hll_vocab": q_hll_vocab,
        "feed_items": q_feed_items,
        "dedup_ngram_prefix": q_dedup_ngram_prefix,
        "cm_sketch": q_cm_sketch,
        "anchor_aliases": q_anchor_aliases,
        "bloom_vocab": q_bloom_vocab,
        "dup_source_matrix": q_dup_source_matrix,
        "component_sizes": q_component_sizes,
        "kg_truth_fusion": q_kg_truth_fusion,
        "kg_source_trust": q_kg_source_trust,
        "hearst_isa": q_hearst_isa,
        "kg_domain_range": q_kg_domain_range,
        "kg_publish": q_kg_publish,
        "taxonomy_closure": q_taxonomy_closure,
        "zipf_profile": q_zipf_profile,
        "robots_filter": q_robots_filter,
        "url_canonical": q_url_canonical,
        "cdx_latest": q_cdx_latest,
        "kg_profile": q_kg_profile,
        "kg_functional_violations": q_kg_functional_violations,
        "graph_jaccard": q_graph_jaccard,
        "dedup_ngram": q_dedup_ngram,
        "text_stats": q_text_stats,
        "rerank_search": q_rerank_search,
        "curation": q_curation,
        "curation_v2": q_curation_v2,
        "curation_v3": q_curation_v3,
        "curation_v4": q_curation_v4,
        "curation_v5": q_curation_v5,
        "ann_lsh": q_ann_lsh,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views pre-registered: region nation customer supplier
# part orders lineitem events documents embeddings)
# ---------------------------------------------------------------------------

_DERIVED = """
WITH derived AS (
  SELECT
    'https://docs.example/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
    doc_id, lang, text,
    'Entity' || CAST(doc_id % 50 AS VARCHAR) AS subj,
    'Entity' || CAST((doc_id * 7 + 13) % 50 AS VARCHAR) AS obj,
    CASE doc_id % 6
      WHEN 0 THEN 'acquired' WHEN 1 THEN 'founded_by' WHEN 2 THEN 'located_in'
      WHEN 3 THEN 'partnered_with' WHEN 4 THEN 'subsidiary_of' WHEN 5 THEN 'works_for'
    END AS pred,
    CASE doc_id % 6
      WHEN 0 THEN 'acquired' WHEN 1 THEN 'was founded by' WHEN 2 THEN 'is located in'
      WHEN 3 THEN 'partnered with' WHEN 4 THEN 'is a subsidiary of' WHEN 5 THEN 'works for'
    END AS connector
  FROM documents
)
"""


_FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures")


from augmented_codebase_indexer_spark.operators.dedup import (  # noqa: E402
    minhash_oracle_sql as _minhash_oracle_sql,
)


def _simhash_oracle_sql(max_hamming: int) -> str:
    """DuckDB mirror of operators/dedup.simhash_near_duplicates (60-bit
    SimHash re-summed from unnested (token, bit) votes)."""
    from augmented_codebase_indexer_spark.functions import sqlhash as SH

    h = SH.h60_expr("tok", "duckdb")
    return f"""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(list_filter(string_split(lower(text), ' '), t -> t != '')) AS tok
      FROM documents),
    hs AS (SELECT id, {h} AS h FROM toks),
    bits AS (SELECT id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
             FROM hs, unnest(range({SH.SIMHASH_BITS})) AS r(i) GROUP BY id, i),
    fps AS (SELECT id, sum(CASE WHEN vote > 0 THEN 1::BIGINT << i ELSE 0 END) AS sim
            FROM bits GROUP BY id),
    chunks AS (SELECT id, sim, (c || ':' || ((sim >> (15 * c)) & 32767)) AS chunk
               FROM fps, unnest(range({SH.SIMHASH_CHUNKS})) AS r(c)),
    cand AS (SELECT DISTINCT a.id AS ida, a.sim AS sima, b.id AS idb, b.sim AS simb
             FROM chunks a JOIN chunks b ON a.chunk = b.chunk AND a.id < b.id)
    SELECT ida, idb, CAST(bit_count(xor(sima, simb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sima, simb)) <= {max_hamming}
    """


def _embedding_lsh_oracle_sql(threshold: float, bits: int = 16) -> str:
    """DuckDB mirror of operators/ann.embedding_near_duplicates_lsh —
    identical sign signature, auto band count, exact cosine verify."""
    from augmented_codebase_indexer_spark.functions.sqlhash import sign_signature_expr
    from augmented_codebase_indexer_spark.operators.ann import auto_bands

    bands = auto_bands(threshold, bits=bits, rows_per_band=2)
    sig = sign_signature_expr("embedding", bits, "duckdb")
    return f"""
    WITH sigs AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS vec,
                         {sig} AS sig FROM embeddings),
    bkeys AS (SELECT id, (b || ':' || ((sig >> (2 * b)) & 3)) AS band_key
              FROM sigs, unnest(range({bands})) AS r(b)),
    cand AS (SELECT DISTINCT a.id AS ida, b.id AS idb
             FROM bkeys a JOIN bkeys b ON a.band_key = b.band_key AND a.id < b.id),
    scored AS (SELECT ida, idb,
                      round(list_cosine_similarity(sa.vec, sb.vec), 6) AS cosine
               FROM cand JOIN sigs sa ON sa.id = ida JOIN sigs sb ON sb.id = idb)
    SELECT ida, idb, cosine FROM scored WHERE cosine >= {threshold}
    """


def _ann_lsh_oracle_sql(query_ids: tuple, k: int, bits: int = 16, bands: int = 4) -> str:
    """DuckDB mirror of operators/ann.lsh_bucket_topk (banded-OR candidate
    set, exact cosine re-rank, deterministic top-k)."""
    from augmented_codebase_indexer_spark.functions.sqlhash import sign_signature_expr

    rows = bits // bands
    mask = (1 << rows) - 1
    sig = sign_signature_expr("embedding", bits, "duckdb")
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH sigs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
                         {sig} AS sig FROM embeddings),
    bkeys AS (SELECT vec_id, (b || ':' || ((sig >> ({rows} * b)) & {mask})) AS band_key
              FROM sigs, unnest(range({bands})) AS r(b)),
    cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
             FROM bkeys q JOIN bkeys c ON q.band_key = c.band_key
             WHERE q.vec_id IN ({ids}) AND q.vec_id != c.vec_id),
    scored AS (SELECT query_id, neighbor_id,
                      round(list_cosine_similarity(sq.vec, sc.vec), 6) AS cosine
               FROM cand JOIN sigs sq ON sq.vec_id = query_id
                         JOIN sigs sc ON sc.vec_id = neighbor_id)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored) WHERE rank <= {k}
    """


def _hybrid_search_oracle_sql(query: str, k: int = 10) -> str:
    """DuckDB mirror of plans/search.hybrid_search: the pattern branch and
    all fusion stages are live SQL; the corpus hash embeddings come from the
    frozen pure-Python fixture (the only non-SQL-expressible piece)."""
    from augmented_codebase_indexer_spark.functions.hashing import hash_embedding

    toks = [t for t in query.lower().split() if t]
    hits = " + ".join(f"CAST(contains(text, '{t}') AS INT)" for t in toks)
    any_hit = " OR ".join(f"contains(text, '{t}')" for t in toks)
    qvec = "[" + ", ".join(repr(x) for x in hash_embedding(query, 64)) + "]"
    fixture = os.path.join(_FIXTURES, "hash_embeddings_sf0_01.parquet")
    return f"""
    WITH pat AS (
      SELECT doc_id AS item_id, ({hits}) / {float(len(toks))} AS score,
             'pattern' AS backend
      FROM documents WHERE {any_hit}),
    corpus AS (SELECT doc_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM read_parquet('{fixture}')),
    vscored AS (SELECT doc_id AS item_id,
                       round(list_cosine_similarity(emb, {qvec}), 6) AS score,
                       'vector' AS backend FROM corpus),
    vec AS (SELECT * FROM vscored ORDER BY score DESC, item_id ASC LIMIT {k * 5}),
    pmax AS (SELECT max(score) AS mp FROM pat),
    vmax AS (SELECT max(score) AS mv FROM vec),
    patn AS (SELECT item_id, round(score / mp * mv, 6) AS score, backend
             FROM pat, pmax, vmax),
    u AS (SELECT * FROM patn UNION ALL SELECT * FROM vec),
    best AS (SELECT item_id, score, backend FROM (
      SELECT *, row_number() OVER (PARTITION BY item_id
                                   ORDER BY score DESC, backend ASC) AS rn FROM u)
      WHERE rn = 1)
    SELECT item_id, score, backend FROM best
    ORDER BY score DESC, item_id ASC LIMIT {k}
    """


def _rerank_oracle_sql(query: str, k: int = 10) -> str:
    """DuckDB mirror of plans/search.rerank_search: pattern over-fetch ×5 →
    quality rescore (the text_stats quality formula) → deterministic cut."""
    toks = [t for t in query.lower().split() if t]
    hits = " + ".join(f"CAST(contains(text, '{t}') AS INT)" for t in toks)
    any_hit = " OR ".join(f"contains(text, '{t}')" for t in toks)
    from augmented_codebase_indexer_spark.operators.textstats import (
        quality_micro_sql,
    )

    quality = quality_micro_sql("text")
    return f"""
    WITH cands AS (
      SELECT doc_id AS item_id, ({hits}) / {float(len(toks))} AS score
      FROM documents WHERE {any_hit}
      ORDER BY score DESC, item_id ASC LIMIT {k * 5}),
    qual AS (SELECT doc_id AS item_id, {quality} AS quality_micro FROM documents)
    SELECT item_id,
           (CAST(round(score * 1000000) AS BIGINT) * 8 + quality_micro * 2) // 10
             AS rerank_micro,
           score AS retrieval_score
    FROM cands JOIN qual USING (item_id)
    ORDER BY rerank_micro DESC, item_id ASC LIMIT {k}
    """


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["kg_extract_text"] = _DERIVED + """
    SELECT url, text || chr(10) || subj || ' ' || connector || ' ' || obj || '.'
           AS extracted_text
    FROM derived
    """

    sql["kg_triples"] = _DERIVED + """
    SELECT substr(sha256(subj || '|org'), 1, 16) AS subj_id,
           pred,
           substr(sha256(obj || '|org'), 1, 16) AS obj_id,
           url
    FROM derived WHERE lang = 'en'
    """

    sql["kg_mentions"] = _DERIVED + """
    SELECT url, CAST(2 AS BIGINT) AS n_mentions FROM derived WHERE lang = 'en'
    """
    # the join-based tier must land on the identical oracle
    sql["kg_mentions_joins"] = sql["kg_mentions"]

    sql["kg_node_degree"] = _DERIVED + """
    SELECT node_id, COUNT(*) AS mention_count FROM (
      SELECT substr(sha256(subj || '|org'), 1, 16) AS node_id FROM derived WHERE lang='en'
      UNION ALL
      SELECT substr(sha256(obj || '|org'), 1, 16) FROM derived WHERE lang='en'
    ) GROUP BY node_id
    """

    sql["q1_pricing_summary"] = """
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """

    sql["join_topk_revenue"] = """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY revenue DESC, n_name ASC LIMIT 5
    """

    sql["incremental_diff"] = """
    WITH cur AS (
      SELECT CAST(o_orderkey AS VARCHAR) url,
             sha256(CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                              ELSE o_totalprice END AS VARCHAR)) h
      FROM orders WHERE o_orderkey % 3 != 0),
    idx AS (
      SELECT CAST(o_orderkey AS VARCHAR) url, sha256(CAST(o_totalprice AS VARCHAR)) h
      FROM orders WHERE o_orderkey % 5 != 0)
    SELECT change, count(*) AS n FROM (
      SELECT CASE WHEN idx.url IS NULL THEN 'new'
                  WHEN cur.url IS NULL THEN 'deleted'
                  WHEN cur.h != idx.h THEN 'modified'
                  ELSE 'unchanged' END AS change
      FROM cur FULL OUTER JOIN idx ON cur.url = idx.url
    ) GROUP BY change
    """

    sql["interval_antijoin"] = """
    SELECT e.event_type, count(*) AS n FROM events e
    WHERE e.event_type != 'error' AND NOT EXISTS (
      SELECT 1 FROM events x WHERE x.event_type = 'error'
        AND x.user_id = e.user_id AND e.value >= x.value AND e.value <= x.value + 10)
    GROUP BY e.event_type
    """

    sql["window_dedup"] = """
    SELECT event_id, user_id, event_type, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY value DESC, event_id ASC) rn
      FROM events) WHERE rn = 1
    """

    sql["rrf_fuse"] = """
    WITH a AS (SELECT doc_id item_id,
                      row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) rank
               FROM documents),
         b AS (SELECT doc_id item_id,
                      row_number() OVER (ORDER BY (doc_id * 37) % 101 DESC, doc_id ASC) rank
               FROM documents),
         u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
    SELECT item_id, round(sum(1.0 / (60 + rank)), 6) AS rrf_score
    FROM u GROUP BY item_id ORDER BY rrf_score DESC, item_id ASC LIMIT 20
    """

    sql["percentiles"] = """
    SELECT event_type, round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS p50,
           round(CAST(quantile_cont(value, 0.95) AS DOUBLE), 4) AS p95
    FROM events GROUP BY event_type
    """

    sql["lang_stats"] = """
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 2) AS avg_chars
    FROM documents GROUP BY lang
    """

    sql["distinct_sources"] = """
    SELECT lang, count(DISTINCT source) AS n_sources FROM documents GROUP BY lang
    """

    sql["topk_docs"] = """
    SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 10
    """

    sql["set_ops"] = """
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 150
    """

    sql["group_collect"] = """
    SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources
    FROM documents GROUP BY lang
    """

    sql["sha_hash"] = """
    SELECT doc_id, sha256(text) AS content_hash FROM documents
    """

    sql["dedup_exact"] = """
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000, text FROM documents WHERE doc_id < 100)
    SELECT sha256(text) AS content_hash, count(*) AS dup_count,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS ids
    FROM all_docs GROUP BY sha256(text) HAVING count(*) > 1
    """

    sql["dedup_ngram"] = """
    WITH tok0 AS (
      SELECT DISTINCT doc_id AS id, g.gram FROM documents,
             unnest(string_split(text, ' ')) AS g(gram)),
    keep AS (SELECT gram FROM tok0 GROUP BY gram HAVING count(*) <= 50),
    tok AS (SELECT tok0.* FROM tok0 JOIN keep USING (gram)),
    sizes AS (SELECT id, count(*) sz FROM tok GROUP BY id),
    inter AS (
      SELECT a.id ida, b.id idb, count(*) n FROM tok a
      JOIN tok b ON a.gram = b.gram AND a.id < b.id GROUP BY a.id, b.id)
    SELECT ida, idb,
           CAST((n * 1000000) // (sa.sz + sb.sz - n) AS BIGINT) AS jaccard_micro
    FROM inter JOIN sizes sa ON sa.id = ida JOIN sizes sb ON sb.id = idb
    WHERE n * 1000000 >= 800000 * (sa.sz + sb.sz - n)
    """

    # prefix-filtered tier: IDENTICAL output to the plain exact tier by
    # the prefix-filtering theorem, so it shares the oracle verbatim
    sql["dedup_ngram_prefix"] = sql["dedup_ngram"]

    sql["dedup_minhash"] = _minhash_oracle_sql(threshold=0.5, max_bucket_size=200)
    # cluster winners: the same pair SQL, closed into components by a
    # recursive CTE (min-label reachability), winner = min id = the label
    sql["near_dedup_winners"] = f"""
    WITH RECURSIVE pairs AS (
      SELECT ida, idb FROM ({_minhash_oracle_sql(threshold=0.5, max_bucket_size=200)})
    ),
    edges AS (SELECT ida AS src, idb AS dst FROM pairs
              UNION SELECT idb, ida FROM pairs),
    cc AS (
      SELECT src AS id, src AS label FROM edges
      UNION
      SELECT e.dst AS id, c.label FROM cc c JOIN edges e ON e.src = c.id
    ),
    comp AS (SELECT id, min(label) AS component FROM cc GROUP BY id)
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS cluster_id,
           coalesce(c.component, d.doc_id) = d.doc_id AS is_winner
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """
    from augmented_codebase_indexer_spark.functions.sqlhash import h60_expr

    _h60_doc = h60_expr("CAST(doc_id AS VARCHAR)", "duckdb")
    sql["cluster_cap"] = f"""
    WITH RECURSIVE pairs AS (
      SELECT ida, idb FROM ({_minhash_oracle_sql(threshold=0.5, max_bucket_size=200)})
    ),
    edges AS (SELECT ida AS src, idb AS dst FROM pairs
              UNION SELECT idb, ida FROM pairs),
    cc AS (
      SELECT src AS id, src AS label FROM edges
      UNION
      SELECT e.dst AS id, c.label FROM cc c JOIN edges e ON e.src = c.id
    ),
    comp AS (SELECT id, min(label) AS component FROM cc GROUP BY id),
    labels AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
    SELECT doc_id, cluster_id, cluster_rank FROM (
      SELECT doc_id, cluster_id,
             CAST(row_number() OVER (PARTITION BY cluster_id
                  ORDER BY {_h60_doc} ASC, doc_id ASC) AS BIGINT) AS cluster_rank
      FROM labels)
    WHERE cluster_rank <= 2
    """

    sql["dedup_simhash"] = _simhash_oracle_sql(max_hamming=10)
    sql["dedup_embedding_lsh"] = _embedding_lsh_oracle_sql(threshold=0.5)
    sql["ann_lsh"] = _ann_lsh_oracle_sql(query_ids=(0, 1, 2, 3, 4), k=3)

    sql["dedup_embedding"] = """
    SELECT a.vec_id AS ida, b.vec_id AS idb,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.5
    """

    sql["ann_topk"] = """
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT q.vec_id query_id, c.vec_id neighbor_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) cosine,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                        c.vec_id ASC) rank
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id IN (0,1,2,3,4))
    WHERE rank <= 3
    """

    from augmented_codebase_indexer_spark.operators.textstats import (
        quality_micro_sql as _qms,
    )

    sql["text_stats"] = """
    SELECT doc_id,
      len(string_split(text, ' '))::INT AS n_tokens_ws,
      len(regexp_extract_all(text, '[a-z0-9]+'))::INT AS n_tokens_re,
      length(text)::INT AS n_chars_out,
      """ + _qms("text") + """ AS quality_micro,
      CASE WHEN greatest(
             len(regexp_extract_all(text, '\\b(the|and|of|with|for)\\b')),
             len(regexp_extract_all(text, '\\b(der|die|und|das|mit)\\b')),
             len(regexp_extract_all(text, '\\b(le|la|et|les|des)\\b')),
             len(regexp_extract_all(text, '\\b(el|los|las|y|con)\\b'))) = 0 THEN 'unknown'
           WHEN len(regexp_extract_all(text, '\\b(the|and|of|with|for)\\b')) = greatest(
             len(regexp_extract_all(text, '\\b(the|and|of|with|for)\\b')),
             len(regexp_extract_all(text, '\\b(der|die|und|das|mit)\\b')),
             len(regexp_extract_all(text, '\\b(le|la|et|les|des)\\b')),
             len(regexp_extract_all(text, '\\b(el|los|las|y|con)\\b'))) THEN 'en'
           WHEN len(regexp_extract_all(text, '\\b(der|die|und|das|mit)\\b')) = greatest(
             len(regexp_extract_all(text, '\\b(the|and|of|with|for)\\b')),
             len(regexp_extract_all(text, '\\b(der|die|und|das|mit)\\b')),
             len(regexp_extract_all(text, '\\b(le|la|et|les|des)\\b')),
             len(regexp_extract_all(text, '\\b(el|los|las|y|con)\\b'))) THEN 'de'
           WHEN len(regexp_extract_all(text, '\\b(le|la|et|les|des)\\b')) = greatest(
             len(regexp_extract_all(text, '\\b(the|and|of|with|for)\\b')),
             len(regexp_extract_all(text, '\\b(der|die|und|das|mit)\\b')),
             len(regexp_extract_all(text, '\\b(le|la|et|les|des)\\b')),
             len(regexp_extract_all(text, '\\b(el|los|las|y|con)\\b'))) THEN 'fr'
           ELSE 'es' END AS lang_pred
    FROM documents
    """

    sql["event_window"] = """
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY 1, 2
    """

    sql["traverse"] = """
    WITH RECURSIVE e AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) src,
             CAST((user_id * 3 + 7) % 50 AS VARCHAR) dst FROM events),
    r AS (
      SELECT '1' AS node_id, 0 AS hops
      UNION ALL
      SELECT e.dst, r.hops + 1 FROM r JOIN e ON e.src = r.node_id WHERE r.hops < 3)
    SELECT node_id, MIN(hops)::INT AS hops FROM r GROUP BY node_id
    """

    sql["topo_layers"] = """
    WITH RECURSIVE e AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) src,
             CAST(user_id * 2 + 1 + event_id % 2 AS VARCHAR) dst
      FROM events WHERE user_id * 2 + 1 + event_id % 2 < 200),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    roots AS (SELECT node FROM nodes WHERE node NOT IN (SELECT dst FROM e)),
    walk AS (
      SELECT node, 0 AS layer FROM roots
      UNION ALL
      SELECT e.dst, walk.layer + 1 FROM walk JOIN e ON e.src = walk.node
      WHERE walk.layer < 64)
    SELECT node AS node_id, MAX(layer)::INT AS layer FROM walk GROUP BY node
    """

    sql["mrr"] = """
    SELECT lang, round(1.0 / MIN(rank), 6) AS rr FROM (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) rank
      FROM documents) WHERE doc_id % 3 = 0 GROUP BY lang
    """

    sql["outer_join_histogram"] = """
    SELECT n_orders, count(*) AS n_customers FROM (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    GROUP BY n_orders
    """

    sql["having_filter"] = """
    SELECT user_id, event_type, count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY user_id, event_type HAVING count(*) >= 20
    """

    sql["cube_stats"] = """
    SELECT coalesce(lang, '<all>') AS lang, coalesce(source, '<all>') AS source,
           count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY CUBE (lang, source)
    """

    sql["semi_join"] = """
    SELECT c_mktsegment, count(*) AS n_customers FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    GROUP BY c_mktsegment
    """

    sql["pattern_search"] = """
    SELECT doc_id AS item_id,
           round((CAST(contains(text, 'spark') AS INT)
                + CAST(contains(text, 'window') AS INT)
                + CAST(contains(text, 'join') AS INT)) / 3.0, 6) AS score
    FROM documents
    WHERE contains(text, 'spark') OR contains(text, 'window') OR contains(text, 'join')
    """

    sql["score_normalize"] = """
    SELECT event_id,
           round(value / max(value) OVER (PARTITION BY event_type), 6) AS norm
    FROM events
    """

    from augmented_codebase_indexer_spark.functions.sqlhash import fingerprint_expr
    from augmented_codebase_indexer_spark.operators.chunking import (
        chunk_oracle_sql,
        chunk_sentence_oracle_sql,
    )
    from augmented_codebase_indexer_spark.operators.summary import summary_oracle_sql

    sql["fingerprint"] = f"""
    SELECT doc_id,
           array_to_string(list_transform({fingerprint_expr('text', 'duckdb')},
                                          x -> CAST(x AS VARCHAR)), ',') AS fp
    FROM documents
    """

    # frozen numpy fixture over the same closed-form outlink graph
    # (scripts/make_fixtures.py; sf0.01, the driver's correctness scale)
    sql["pagerank"] = f"""
    SELECT node_id, pagerank
    FROM read_parquet('{os.path.join(_FIXTURES, "pagerank_sf0_01.parquet")}')
    """

    sql["ppr"] = f"""
    SELECT node_id, pagerank
    FROM read_parquet('{os.path.join(_FIXTURES, "ppr_sf0_01.parquet")}')
    """

    sql["hybrid_search"] = _hybrid_search_oracle_sql("spark window join", k=10)
    sql["rerank_search"] = _rerank_oracle_sql("spark window join", k=10)
    from augmented_codebase_indexer_spark.operators.curation_filters import (
        boilerplate_oracle_sql,
        repetition_oracle_sql,
    )

    sql["boilerplate_prune"] = boilerplate_oracle_sql(min_df=3)
    sql["repetition_stats"] = repetition_oracle_sql()
    sql["chunking"] = chunk_oracle_sql(size=40, overlap=10)
    punct = """(
      WITH __p AS (SELECT doc_id, string_split(text, ' ') AS toks,
                          len(string_split(text, ' ')) AS n FROM documents)
      SELECT doc_id,
             array_to_string(list_transform(range(1, n + 1),
                 j -> CASE WHEN j % 9 = 0 THEN toks[j] || '.' ELSE toks[j] END), ' ') AS text
      FROM __p)"""
    sql["chunking_sentence"] = chunk_sentence_oracle_sql(
        size=40, overlap=10, tol=5, table=punct
    )
    sql["summaries"] = summary_oracle_sql()

    # artifact table = doc summaries ∪ chunk artifacts; pattern coverage per
    # artifact, keep-max per doc (tie-break artifact_type asc), top-k
    _art_toks = ["spark", "window", "join"]
    _hits = " + ".join(f"CAST(contains(content, '{t}') AS INT)" for t in _art_toks)
    sql["artifact_search"] = f"""
    WITH summaries AS ({summary_oracle_sql()}),
    chunks AS (
      SELECT doc_id, 'chunk' AS artifact_type, chunk_text AS content,
             n_tokens
      FROM ({chunk_oracle_sql(size=40, overlap=10)})),
    art AS (SELECT * FROM summaries UNION ALL SELECT * FROM chunks),
    scored AS (
      SELECT doc_id AS item_id, artifact_type,
             ({_hits}) / 3.0 AS score
      FROM art WHERE ({_hits}) / 3.0 > 0),
    best AS (SELECT item_id, artifact_type, score FROM (
      SELECT *, row_number() OVER (PARTITION BY item_id
                                   ORDER BY score DESC, artifact_type ASC) AS rn
      FROM scored) WHERE rn = 1)
    SELECT item_id, artifact_type, score FROM best
    ORDER BY score DESC, item_id ASC LIMIT 10
    """

    sql["outlinks"] = _DERIVED + """
    SELECT url AS src_url,
           unnest(['/', '/about', '/entity/' || obj]) AS href
    FROM derived
    """

    # anchor-term profile over the same three nav anchors per derived
    # page ('home' → '/', 'about' → '/about', 'related' → '/entity/K');
    # counts BIGINT, rank row_number over (n DESC, tok ASC) — exact.
    sql["anchor_profile"] = _DERIVED + """
    , anchors AS (
      SELECT '/' AS href, 'home' AS anchor FROM derived
      UNION ALL SELECT '/about', 'about' FROM derived
      UNION ALL SELECT '/entity/' || obj, 'related' FROM derived),
    toks AS (
      SELECT href,
             unnest(string_split_regex(lower(anchor), '[^a-z0-9]+')) AS tok
      FROM anchors),
    c AS (
      SELECT href, tok, CAST(count(*) AS BIGINT) AS n
      FROM toks WHERE tok <> '' GROUP BY href, tok),
    r AS (
      SELECT href, tok, n,
             CAST(row_number() OVER (
               PARTITION BY href ORDER BY n DESC, tok ASC) AS BIGINT) AS rank
      FROM c)
    SELECT href, tok, n, rank FROM r WHERE rank <= 3
    """

    # anchor → alias candidates: the same profile filtered to entity
    # pages, entity id recovered from the href
    sql["anchor_aliases"] = (
        "SELECT regexp_extract(href, '^/entity/(.+)$', 1) AS ent_id, "
        "tok AS alias, n, rank "
        f"FROM ({sql['anchor_profile']}) WHERE href LIKE '/entity/%'"
    )

    # redirect resolution: recursive-CTE mirror over the same closed-form
    # edge relation (chains of 5 per bucket, every 500th bucket looped);
    # the 16-hop recursion bound terminates loops, which then surface as
    # is_cycle via the never-reached-a-terminal anti-join
    from augmented_codebase_indexer_spark.operators.redirects import (
        resolve_redirects_sql,
    )

    _redirect_edges = """
      SELECT d1.url AS src, d2.url AS dst
      FROM derived d1 JOIN derived d2 ON d2.doc_id = d1.doc_id - 1
      WHERE d1.doc_id % 5 <> 0
      UNION ALL
      SELECT d1.url AS src, d2.url AS dst
      FROM derived d1 JOIN derived d2 ON d2.doc_id = d1.doc_id + 4
      WHERE d1.doc_id % 500 = 0
    """
    sql["redirect_resolve"] = (
        _DERIVED.replace("WITH derived", "WITH RECURSIVE derived")
        + ", "
        + resolve_redirects_sql(_redirect_edges).strip().removeprefix(
            "WITH RECURSIVE "
        )
    )

    # co-mention PMI over the planted (subj, obj) mention pairs; the
    # gated column is the BIGINT micro-ratio (monotone in PMI) — exact
    from augmented_codebase_indexer_spark.operators.comention import (
        comention_pmi_sql,
    )

    sql["comention_pmi"] = (
        _DERIVED
        + ", "
        + comention_pmi_sql(
            "SELECT doc_id, subj AS ent FROM derived "
            "UNION ALL SELECT doc_id, obj AS ent FROM derived"
        ).strip().removeprefix("WITH ")
    )

    # phrase search: same tokenization + position semantics both engines
    from augmented_codebase_indexer_spark.operators.phrase import phrase_match_sql

    sql["phrase_search"] = phrase_match_sql("table scan")

    # directed containment: same gram/max_df machinery as dedup_ngram,
    # gated by integer cross-multiply against |g(contained)|
    sql["dedup_containment"] = """
    WITH tok0 AS (
      SELECT DISTINCT doc_id AS id, g.gram FROM documents,
             unnest(string_split(text, ' ')) AS g(gram)),
    keep AS (SELECT gram FROM tok0 GROUP BY gram HAVING count(*) <= 50),
    tok AS (SELECT tok0.* FROM tok0 JOIN keep USING (gram)),
    sizes AS (SELECT id, count(*) sz FROM tok GROUP BY id),
    inter AS (
      SELECT a.id ida, b.id idb, count(*) n FROM tok a
      JOIN tok b ON a.gram = b.gram AND a.id < b.id GROUP BY a.id, b.id),
    j AS (SELECT i.*, sa.sz sza, sb.sz szb FROM inter i
          JOIN sizes sa ON sa.id = ida JOIN sizes sb ON sb.id = idb)
    SELECT ida AS contained, idb AS container,
           CAST((n * 1000000) // sza AS BIGINT) AS containment_micro
    FROM j WHERE n * 1000000 >= 900000 * sza
    UNION ALL
    SELECT idb, ida, CAST((n * 1000000) // szb AS BIGINT)
    FROM j WHERE n * 1000000 >= 900000 * szb
    """

    # gap sessions: epoch floored to whole seconds on BOTH engines (Spark
    # cast(ts as long) truncates; DuckDB CAST(double AS BIGINT) rounds, so
    # the mirror floors explicitly)
    sql["sessionize"] = """
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN prev_ts IS NULL
                       OR CAST(floor(epoch(ts)) AS BIGINT)
                          - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM ordered),
    sess AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged)
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           max(CAST(floor(epoch(ts)) AS BIGINT))
             - min(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_sec,
           round(sum(value), 4) AS total_value
    FROM sess GROUP BY user_id, session_seq
    """

    from augmented_codebase_indexer_spark.operators.profiling import profile_oracle_sql

    sql["profile"] = profile_oracle_sql(
        "documents", ["doc_id", "lang", "source", "n_chars"], ["doc_id", "n_chars"]
    )

    sql["moving_avg"] = """
    SELECT event_id,
           round(avg(value) OVER w, 6) AS avg_1h,
           count(*) OVER w AS n_1h
    FROM (SELECT event_id, user_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ep
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """

    sql["pivot_counts"] = """
    SELECT user_id,
           count(*) FILTER (event_type = 'click') AS n_click,
           count(*) FILTER (event_type = 'view') AS n_view,
           count(*) FILTER (event_type = 'purchase') AS n_purchase,
           count(*) FILTER (event_type = 'signup') AS n_signup,
           count(*) FILTER (event_type = 'error') AS n_error
    FROM events GROUP BY user_id
    """

    from augmented_codebase_indexer_spark.plans.curation import (
        curation_oracle_sql,
        curation_funnel_oracle_sql,
        curation_v2_oracle_sql,
        curation_v3_oracle_sql,
        curation_v4_oracle_sql,
    )

    sql["curation"] = curation_oracle_sql()
    sql["curation_v2"] = curation_v2_oracle_sql()
    sql["curation_v3"] = curation_v3_oracle_sql(decontam_n=3)
    sql["curation_v4"] = curation_v4_oracle_sql(decontam_n=3)
    from augmented_codebase_indexer_spark.plans.curation import curation_v5_oracle_sql

    sql["curation_v5"] = curation_v5_oracle_sql(decontam_n=3)
    sql["curation_v6"] = curation_v5_oracle_sql(
        decontam_n=3, lid="trained",
        lid_langs=["de", "en", "es", "fr", "zh"],
    )

    from augmented_codebase_indexer_spark.operators.bm25 import bm25_oracle_sql

    sql["bm25_search"] = bm25_oracle_sql(["spark", "window", "join"], k=25)

    from augmented_codebase_indexer_spark.operators.paradedup import (
        paragraph_dedup_oracle_sql,
    )

    sql["paragraph_dedup"] = paragraph_dedup_oracle_sql(
        _token_paras_sql("duckdb"), sep=" "
    )

    from augmented_codebase_indexer_spark.operators.communities import (
        lpa_oracle_sql,
    )

    sql["lpa_communities"] = lpa_oracle_sql(
        _entity_graph_sql("duckdb"), rounds=4
    )

    from augmented_codebase_indexer_spark.operators.bgp import bgp_oracle_sql

    sql["kg_bgp_match"] = bgp_oracle_sql(
        _typed_triples_sql("duckdb"),
        [("?p", "works_at", "?org"), ("?p", "born_in", "?city")],
    )

    from augmented_codebase_indexer_spark.operators.anchors import (
        mention_commonness_sql,
    )

    sql["mention_commonness"] = mention_commonness_sql(
        _ambiguous_anchors_sql("duckdb")
    )

    from augmented_codebase_indexer_spark.operators.bursts import (
        daily_bursts_oracle_sql,
    )

    sql["daily_bursts"] = daily_bursts_oracle_sql(factor=(6, 5))

    from augmented_codebase_indexer_spark.operators.negatives import (
        negative_samples_oracle_sql,
    )

    sql["kg_negatives"] = negative_samples_oracle_sql(
        _typed_triples_sql("duckdb"), k=2
    )

    from augmented_codebase_indexer_spark.operators.walks import (
        skipgram_oracle_sql,
    )

    sql["walk_skipgrams"] = skipgram_oracle_sql(
        _entity_graph_sql("duckdb"), window=2, walk_len=4, walks_per_node=2
    )

    from augmented_codebase_indexer_spark.operators.hits import hits_oracle_sql

    sql["graph_hits"] = hits_oracle_sql(_entity_graph_sql("duckdb"), rounds=3)

    from augmented_codebase_indexer_spark.operators.predalign import (
        predicate_alignment_oracle_sql,
    )

    sql["predicate_alignment"] = predicate_alignment_oracle_sql(
        _synonym_triples_sql("duckdb"), threshold=(1, 3)
    )

    from augmented_codebase_indexer_spark.operators.graphalgs import (
        clustering_oracle_sql,
    )

    sql["clustering_coeff"] = clustering_oracle_sql(
        _entity_graph_sql("duckdb")
    )

    from augmented_codebase_indexer_spark.operators.literals import (
        type_object_literals_oracle_sql,
    )

    sql["kg_literals"] = type_object_literals_oracle_sql(
        _literal_triples_sql("duckdb")
    )

    from augmented_codebase_indexer_spark.operators.temporal import (
        allen_relations_oracle_sql,
    )

    _aa, _ab = _interval_tables_sql("duckdb")
    sql["allen_relations"] = allen_relations_oracle_sql(_aa, _ab)

    from augmented_codebase_indexer_spark.operators.postings import (
        snippet_oracle_sql,
    )

    sql["snippet_search"] = snippet_oracle_sql(
        ["spark", "window", "join"], window=12, context=4
    )

    from augmented_codebase_indexer_spark.operators.robots import (
        robots_sitemaps_oracle_sql,
    )

    sql["robots_sitemaps"] = robots_sitemaps_oracle_sql(
        _robots_files_sql("duckdb")
    )

    from augmented_codebase_indexer_spark.operators.funnel import (
        funnel_oracle_sql,
    )

    sql["event_funnel"] = funnel_oracle_sql(
        "SELECT user_id, event_type, ts FROM events",
        ["signup", "click", "purchase"],
    )

    from augmented_codebase_indexer_spark.operators.cohorts import (
        retention_cohorts_oracle_sql,
    )

    sql["retention_cohorts"] = retention_cohorts_oracle_sql()

    from augmented_codebase_indexer_spark.operators.transitions import (
        event_transitions_oracle_sql,
    )

    sql["event_transitions"] = event_transitions_oracle_sql()

    from augmented_codebase_indexer_spark.operators.readability import (
        readability_oracle_sql,
    )

    sql["readability"] = readability_oracle_sql()

    from augmented_codebase_indexer_spark.operators.collocations import (
        bigram_llr_oracle_sql,
    )

    sql["collocations"] = bigram_llr_oracle_sql()

    from augmented_codebase_indexer_spark.operators.urlparams import (
        param_rules_oracle_sql,
    )

    sql["url_param_rules"] = param_rules_oracle_sql(
        _param_pages_sql("duckdb")
    )

    from augmented_codebase_indexer_spark.operators.hostboiler import (
        host_templates_oracle_sql,
    )

    sql["host_boilerplate"] = host_templates_oracle_sql(
        _host_paras_sql("duckdb"), min_docs=3, share=(3, 100)
    )

    from augmented_codebase_indexer_spark.operators.salience import (
        entity_salience_oracle_sql,
    )

    sql["entity_salience"] = entity_salience_oracle_sql(
        _salience_mentions_sql("duckdb"), _doc_tokens_sql()
    )

    from augmented_codebase_indexer_spark.operators.coverage import (
        span_coverage_oracle_sql,
    )

    sql["span_coverage"] = span_coverage_oracle_sql(
        _coverage_spans_sql("duckdb"),
        "SELECT doc_id, CAST(100 + doc_id % 50 AS BIGINT) AS n_tokens "
        "FROM documents",
    )

    from augmented_codebase_indexer_spark.operators.agreement import (
        cohens_kappa_oracle_sql,
    )

    _ka, _kb = _kappa_sides_sql("duckdb")
    sql["extractor_kappa"] = cohens_kappa_oracle_sql(_ka, _kb)

    from augmented_codebase_indexer_spark.operators.webtables import (
        column_types_sql,
        table_relations_sql,
    )

    sql["webtable_types"] = column_types_sql(
        table_relations_sql(_typed_cells_sql("duckdb"))
    )

    from augmented_codebase_indexer_spark.operators.sssp import (
        shortest_paths_oracle_sql,
    )

    _we, _ws = _weighted_graph_sql("duckdb")
    sql["kg_shortest_paths"] = shortest_paths_oracle_sql(
        _we, _ws, rounds=4
    )

    from augmented_codebase_indexer_spark.operators.relatedness import (
        wlm_relatedness_oracle_sql,
    )

    sql["wlm_relatedness"] = wlm_relatedness_oracle_sql(
        _entity_graph_sql("duckdb"), min_common=2
    )

    from augmented_codebase_indexer_spark.operators.kgquality import (
        symmetry_violations_sql,
    )

    sql["kg_symmetry"] = symmetry_violations_sql(
        _symmetric_triples_sql("duckdb"), ("spouse", "sibling")
    )

    from augmented_codebase_indexer_spark.operators.hostlang import (
        host_language_profile_sql,
    )

    sql["host_lang_profile"] = host_language_profile_sql(
        _hostlang_docs_sql("duckdb")
    )

    from augmented_codebase_indexer_spark.operators.pagemeta import (
        page_meta_sql,
    )

    sql["page_meta"] = page_meta_sql(_meta_pages_sql("duckdb"))

    from augmented_codebase_indexer_spark.operators.outline import (
        heading_outline_sql,
    )

    sql["heading_outline"] = heading_outline_sql(
        _outline_pages_sql("duckdb")
    )

    from augmented_codebase_indexer_spark.operators.triplets import (
        retrieval_triplets_oracle_sql,
    )

    sql["retrieval_triplets"] = retrieval_triplets_oracle_sql(
        _triplet_anchors_sql("duckdb"), k=2
    )

    from augmented_codebase_indexer_spark.operators.disambig import (
        disambiguate_oracle_sql,
    )

    _dm, _da = _disambig_tables_sql("duckdb")
    sql["entity_disambig"] = disambiguate_oracle_sql(_dm, _da)

    from augmented_codebase_indexer_spark.operators.budget import (
        crawl_budget_oracle_sql,
    )

    sql["crawl_budget"] = crawl_budget_oracle_sql(
        _host_counts_sql("duckdb"), budget=1000
    )

    from augmented_codebase_indexer_spark.operators.pathtree import (
        url_path_rollup_sql,
    )

    sql["url_path_rollup"] = url_path_rollup_sql(
        _rollup_urls_sql("duckdb"), max_depth=3
    )

    from augmented_codebase_indexer_spark.operators.rake import (
        rake_keyphrases_oracle_sql,
    )

    sql["rake_keyphrases"] = rake_keyphrases_oracle_sql(
        "SELECT doc_id, text FROM documents"
    )

    from augmented_codebase_indexer_spark.operators.hreflang import (
        hreflang_reciprocity_sql,
    )

    sql["hreflang_recip"] = hreflang_reciprocity_sql(
        _hreflang_pages_sql("duckdb")
    )

    from augmented_codebase_indexer_spark.operators.hostlinks import (
        host_link_profile_sql,
    )

    sql["host_link_profile"] = host_link_profile_sql(
        _hostedges_sql("duckdb")
    )

    from augmented_codebase_indexer_spark.operators.rules import (
        mine_pair_rules_oracle_sql,
    )

    sql["kg_rule_mining"] = mine_pair_rules_oracle_sql(
        _rule_triples_sql("duckdb"), min_support=2
    )

    from augmented_codebase_indexer_spark.operators.sitemaps import (
        parse_sitemapindex_sql,
    )

    sql["sitemap_index"] = parse_sitemapindex_sql(
        _sitemapindex_sql("duckdb")
    )

    from augmented_codebase_indexer_spark.operators.fertility import (
        fertility_stats_oracle_sql,
    )

    sql["fertility_stats"] = fertility_stats_oracle_sql(
        "SELECT source AS lang, text FROM documents"
    )

    from augmented_codebase_indexer_spark.operators.syndication import (
        syndication_origins_sql,
    )

    _sp, _sf = _syndication_tables_sql("duckdb")
    sql["syndication_source"] = syndication_origins_sql(_sp, _sf)

    from augmented_codebase_indexer_spark.operators.redirects import (
        resolve_redirects_sql,
    )

    _ci = "(doc_id % 100)"
    sql["canonical_resolve"] = resolve_redirects_sql(f"""
    SELECT DISTINCT
           'https://cc.example/p' || CAST({_ci} AS VARCHAR) AS src,
           'https://cc.example/p' || CAST(
             CASE WHEN {_ci} % 4 IN (1, 2) THEN {_ci} - 1
                  ELSE {_ci} - 2 END AS VARCHAR) AS dst
    FROM documents WHERE {_ci} % 4 <> 0""")

    sql["video_metadata"] = """
    SELECT doc_id,
           CASE WHEN doc_id % 3 IN (0, 1) THEN 'mp4'
                ELSE 'unknown' END AS fmt,
           CASE WHEN doc_id % 3 IN (0, 1) THEN 'isom' END AS major_brand,
           CASE WHEN doc_id % 3 IN (0, 1)
                THEN CAST(600 + (doc_id % 10) * 100 AS BIGINT) END
             AS timescale,
           CASE WHEN doc_id % 3 IN (0, 1)
                THEN (((doc_id % 5000) + 1) * 1000)
                     // (600 + (doc_id % 10) * 100) END AS duration_ms
    FROM documents
    """

    sql["audio_metadata"] = """
    SELECT doc_id,
           CASE WHEN doc_id % 3 IN (0, 1) THEN 'wav'
                ELSE 'unknown' END AS fmt,
           CASE WHEN doc_id % 3 IN (0, 1)
                THEN CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) END
             AS sample_rate,
           CASE WHEN doc_id % 3 IN (0, 1)
                THEN CAST(1 + doc_id % 2 AS BIGINT) END AS channels,
           CASE WHEN doc_id % 3 IN (0, 1)
                THEN CAST(16 AS BIGINT) END AS bits,
           CASE WHEN doc_id % 3 IN (0, 1)
                THEN ((doc_id % 50 + 1) * 1000)
                     // (8000 + (doc_id % 8) * 1000) END AS duration_ms
    FROM documents
    """

    from augmented_codebase_indexer_spark.operators.er import er_matches_oracle_sql

    from augmented_codebase_indexer_spark.operators.walks import walks_oracle_sql

    sql["graph_walks"] = walks_oracle_sql(
        _entity_graph_sql("duckdb"), walk_len=4, walks_per_node=2,
    )

    from augmented_codebase_indexer_spark.operators.postings import (
        proximity_oracle_sql,
    )

    sql["proximity_search"] = proximity_oracle_sql(
        ["spark", "window", "join"], window=12
    )

    sql["er_matches"] = er_matches_oracle_sql(
        """SELECT doc_id AS ent_id,
                  CASE doc_id % 4
                    WHEN 0 THEN concat('Brand', doc_id % 50)
                    WHEN 1 THEN concat('Brand ', doc_id % 50)
                    WHEN 2 THEN concat('brand-', doc_id % 50, 'x')
                    ELSE concat('Brund', doc_id % 50) END AS name
           FROM documents""",
        max_dist=1, block_prefix=5, max_block_size=10000,
    )
    sql["curation_funnel"] = curation_funnel_oracle_sql(decontam_n=3)

    from augmented_codebase_indexer_spark.operators.decontam import (
        decontaminate_oracle_sql,
    )
    from augmented_codebase_indexer_spark.operators.textstats import gopher_oracle_sql
    from augmented_codebase_indexer_spark.operators.pii import redact_pii_oracle_sql

    sql["decontam"] = decontaminate_oracle_sql(
        n=3, eval_pred="doc_id % 53 = 0", cand_pred="doc_id % 53 <> 0"
    )
    from augmented_codebase_indexer_spark.operators.decontam import (
        decontaminate_spans_oracle_sql,
    )

    sql["decontam_spans"] = decontaminate_spans_oracle_sql(
        n=3, eval_pred="doc_id % 53 = 0", cand_pred="doc_id % 53 <> 0"
    )
    from augmented_codebase_indexer_spark.operators.decontam import (
        contamination_report_oracle_sql,
    )

    sql["contam_report"] = contamination_report_oracle_sql(
        n=3, eval_pred="doc_id % 53 = 0", cand_pred="doc_id % 53 <> 0"
    )
    sql["gopher_quality"] = gopher_oracle_sql()
    _pii_injected = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@mail.example.com from '"
        " || CAST(doc_id % 256 AS VARCHAR) || '.0.0.'"
        " || CAST(doc_id % 100 AS VARCHAR)"
        " || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
        " || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    sql["pii_redact"] = redact_pii_oracle_sql(text_expr=_pii_injected)

    from augmented_codebase_indexer_spark.operators.chunking import chunk_oracle_sql
    from augmented_codebase_indexer_spark.operators.sampling import (
        domain_cap_oracle_sql,
        hash_split_oracle_sql,
        pack_sequences_oracle_sql,
        training_mix_oracle_sql,
    )

    sql["domain_cap"] = domain_cap_oracle_sql(k=7)

    from augmented_codebase_indexer_spark.functions.sqlhash import h60_expr
    from augmented_codebase_indexer_spark.operators.domains import (
        domain_sql_expr,
        host_sql_expr,
    )
    from augmented_codebase_indexer_spark.operators.exactsubstr import (
        exact_substr_oracle_sql,
    )

    from augmented_codebase_indexer_spark.operators.lmquality import (
        dsir_oracle_sql,
        lm_quality_oracle_sql,
        lm_vocab_oracle_sql,
    )

    from augmented_codebase_indexer_spark.operators.langid import (
        lang_id_oracle_sql,
    )

    sql["lang_id"] = lang_id_oracle_sql(["de", "en", "es", "fr", "zh"])
    sql["lm_vocab"] = lm_vocab_oracle_sql()
    sql["lm_quality"] = lm_quality_oracle_sql()
    sql["dsir_weights"] = dsir_oracle_sql()

    from augmented_codebase_indexer_spark.operators.corpusstats import (
        slice_kl_oracle_sql,
        zipf_oracle_sql,
    )

    sql["slice_kl"] = slice_kl_oracle_sql()
    sql["zipf_profile"] = zipf_oracle_sql(top_n=100)

    from augmented_codebase_indexer_spark.operators.robots import (
        apply_robots_oracle_sql,
    )

    def _sqlstr(text: str) -> str:
        return "'" + text.replace("\n", "' || chr(10) || '") + "'"

    from augmented_codebase_indexer_spark.operators.urlnorm import (
        canonical_url_sql,
    )

    sql["url_canonical"] = f"""
    WITH u AS (
      SELECT doc_id,
        CASE doc_id % 4
          WHEN 0 THEN 'HTTP://' || upper('site' || (doc_id % 7)
                 || '.example.com') || ':80/p/' || doc_id
                 || '?utm_source=x&b=1#f'
          WHEN 1 THEN 'http://site' || (doc_id % 7) || '.example.com/p/'
                 || doc_id || '?z=2&a=1'
          WHEN 2 THEN 'https://site' || (doc_id % 7) || '.example.com:443/p/'
                 || doc_id || '?fbclid=1'
          ELSE 'http://site' || (doc_id % 7) || '.example.com'
        END AS url
      FROM documents)
    SELECT doc_id, url, {canonical_url_sql('url')} AS canon_url FROM u
    """

    from augmented_codebase_indexer_spark.operators.kgquality import (
        functional_violations_sql,
        predicate_profile_sql,
    )

    sql["kg_profile"] = predicate_profile_sql(_typed_triples_sql("duckdb"))
    sql["kg_functional_violations"] = functional_violations_sql(
        _typed_triples_sql("duckdb"), ("capital_of", "born_in")
    )

    from augmented_codebase_indexer_spark.operators.fusion import (
        source_trust_oracle_sql,
        truth_fusion_oracle_sql,
    )

    sql["kg_truth_fusion"] = truth_fusion_oracle_sql(
        _fusion_assertions_sql("duckdb"), iters=2
    )
    sql["kg_source_trust"] = source_trust_oracle_sql(
        _fusion_assertions_sql("duckdb"), iters=2
    )
    sql["hearst_isa"] = _hearst_expected_sql()

    from augmented_codebase_indexer_spark.operators.traversal import (
        taxonomy_closure_sql,
    )

    sql["taxonomy_closure"] = taxonomy_closure_sql(
        _taxonomy_edges_sql(), max_hops=3
    )

    from augmented_codebase_indexer_spark.operators.kgquality import (
        domain_range_violations_sql,
    )

    sql["kg_domain_range"] = domain_range_violations_sql(
        _typed_triples_sql("duckdb"), _DR_NODE_TYPES_SQL, _DR_DECLS_SQL
    )

    # publish = fusion winners that CONFORM (anti-join of violations ==
    # keep rows whose declared domain/range both match; undeclared preds
    # pass through unconstrained — none planted here)
    sql["kg_publish"] = f"""
    SELECT w.subj, w.pred, w.obj, w.support_micro, w.n_src
    FROM ({truth_fusion_oracle_sql(_fusion_assertions_sql("duckdb"),
                                   iters=2)}) w
    LEFT JOIN ({_PUBLISH_DECLS_SQL}) d ON w.pred = d.pred
    LEFT JOIN ({_PUBLISH_NODE_TYPES_SQL}) s ON w.subj = s.node_id
    LEFT JOIN ({_PUBLISH_NODE_TYPES_SQL}) o ON w.obj = o.node_id
    WHERE d.pred IS NULL
       OR (s.node_type = d.domain_type AND o.node_type = d.range_type)
    """

    from augmented_codebase_indexer_spark.operators.cdx import latest_ok_sql

    def _cdx_line_sql(ts: str, status: str, off: str) -> str:
        return (
            "'com,site' || (doc_id % 7) || ')/p/' || doc_id || ' ' || "
            f"({ts}) || "
            "' {\"url\":\"http://site' || (doc_id % 7) || '.example.com/p/' "
            "|| doc_id || '\",\"status\":\"' || " + status + " || "
            "'\",\"mime\":\"text/html\",\"digest\":\"D' || (doc_id % 13) || "
            "'\",\"filename\":\"w' || (doc_id % 5) || "
            f"'.warc.gz\",\"offset\":\"' || ({off}) || "
            "'\",\"length\":\"100\"}' AS line"
        )

    sql["cdx_latest"] = latest_ok_sql(
        "SELECT " + _cdx_line_sql(
            "20240101000000 + doc_id", "'200'", "doc_id * 100")
        + " FROM documents UNION ALL SELECT " + _cdx_line_sql(
            "20240101000000 + doc_id + 1000000",
            "CASE WHEN doc_id % 11 = 0 THEN '404' ELSE '200' END",
            "doc_id * 100 + 50")
        + " FROM documents"
    )

    _robots_synth_sql = (
        "SELECT 'site' || dnum || '.example.com' AS domain, "
        f"CASE WHEN dnum % 2 = 0 THEN {_sqlstr(_ROBOTS_STAR + _ROBOTS_BOT)} "
        f"ELSE {_sqlstr(_ROBOTS_STAR)} END AS robots_txt "
        "FROM (SELECT DISTINCT doc_id % 7 AS dnum FROM documents)"
    )
    sql["robots_filter"] = apply_robots_oracle_sql(
        "SELECT doc_id, 'https://site' || (doc_id % 7) "
        "|| '.example.com/p/' || doc_id AS url FROM documents",
        _robots_synth_sql,
        "aci-bot",
    )

    # crawl frontier: the composed canonicalize → robots → slot chain,
    # over two url variants per doc (clean + tracking/port variant the
    # canonicalizer must collapse); same robots files as robots_filter
    from augmented_codebase_indexer_spark.operators.frontier import (
        crawl_frontier_oracle_sql,
    )

    sql["crawl_frontier"] = crawl_frontier_oracle_sql(
        "SELECT 'https://site' || (doc_id % 7) || '.example.com/p/' "
        "|| doc_id AS url FROM documents "
        "UNION ALL "
        "SELECT 'HTTPS://SITE' || (doc_id % 7) || '.EXAMPLE.COM:443/p/' "
        "|| doc_id || '?utm_source=feed' FROM documents",
        _robots_synth_sql,
        "aci-bot",
        per_host_cap=60,
    )

    from augmented_codebase_indexer_spark.operators.temporal import (
        predicate_volatility_sql,
        scd2_oracle_sql,
    )

    sql["triples_scd2"] = scd2_oracle_sql(_TEMPORAL_FACTS_SQL)
    sql["kg_volatility"] = predicate_volatility_sql(
        f"SELECT * FROM ({scd2_oracle_sql(_TEMPORAL_FACTS_SQL)})"
    )

    from augmented_codebase_indexer_spark.operators.graphalgs import (
        reciprocity_oracle_sql,
    )

    sql["graph_reciprocity"] = reciprocity_oracle_sql(_entity_graph_sql("duckdb"))

    # JSON-LD items: closed-form block reconstruction (same strings the
    # Spark entry builds into html), field paths via json_valid-guarded
    # ->> so malformed blocks yield NULLs on both engines
    from augmented_codebase_indexer_spark.operators.structured import (
        jsonld_items_sql,
    )

    # feed items: closed-form reconstruction; item_idx = lexical order
    # of the FULL block string (doc-id-string order is NOT the same:
    # '21</title>' sorts after '210</title>' because '<' > '0'), so the
    # oracle rebuilds the exact block text as the sort key
    sql["feed_items"] = """
    WITH b AS (
      SELECT 'site' || (doc_id % 7) || '.example.com' AS feed_url,
             '<item><title>Doc ' || doc_id || '</title><link>'
               || 'https://site' || (doc_id % 7) || '.example.com/p/'
               || doc_id || '</link><pubDate>Fri, '
               || lpad(CAST((doc_id % 27) + 1 AS VARCHAR), 2, '0')
               || ' Jan 2026 08:30:00 GMT</pubDate></item>' AS ord,
             'https://site' || (doc_id % 7) || '.example.com/p/' || doc_id
               AS link,
             'Doc ' || doc_id AS title,
             CAST(1767225600 + (doc_id % 27) * 86400 + 30600 AS BIGINT)
               AS published_epoch
      FROM documents)
    SELECT feed_url,
           CAST(row_number() OVER (PARTITION BY feed_url ORDER BY ord)
                AS BIGINT) AS item_idx,
           link, title, published_epoch
    FROM b
    """

    # tf-idf keywords: identical tokenization/quantization/tie-break;
    # the single float quantization (idf_micro) is tie-distance-audited
    from augmented_codebase_indexer_spark.operators.keywords import (
        tfidf_keywords_sql,
    )

    sql["tfidf_keywords"] = tfidf_keywords_sql(k=3)

    # HLL vocab registers: identical md5-hex register expressions both
    # engines; the gate is the integer (bucket, max_rho) table
    from augmented_codebase_indexer_spark.operators.hll import (
        cm_registers_oracle_sql,
        hll_registers_oracle_sql,
    )

    sql["cm_sketch"] = cm_registers_oracle_sql(
        "SELECT g.tok AS value FROM documents, "
        "unnest(string_split(text, ' ')) AS g(tok) WHERE g.tok <> ''"
    )

    # component-size histogram: recursive-CTE min-label CC over the
    # shared entity graph (self-loops excluded both sides)
    sql["component_sizes"] = f"""
    WITH RECURSIVE raw AS (
      SELECT src, dst FROM ({_entity_graph_sql("duckdb")}) WHERE src <> dst),
    edges AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
    cc AS (
      SELECT src AS id, src AS label FROM edges
      UNION
      SELECT e.dst AS id, c.label FROM cc c JOIN edges e ON e.src = c.id),
    comp AS (SELECT id, min(label) AS component FROM cc GROUP BY id),
    sizes AS (SELECT component, count(*) AS size FROM comp GROUP BY component)
    SELECT CAST(size AS BIGINT) AS size,
           CAST(count(*) AS BIGINT) AS n_components
    FROM sizes GROUP BY size
    """

    # bloom set-bit table: same shared md5 expressions
    from augmented_codebase_indexer_spark.operators.hll import (
        bloom_bits_oracle_sql,
    )

    sql["bloom_vocab"] = bloom_bits_oracle_sql(
        "SELECT g.tok AS value FROM documents, "
        "unnest(string_split(text, ' ')) AS g(tok) WHERE g.tok <> ''"
    )

    # cross-source duplication matrix: the dedup_ngram pair SQL joined
    # back to each side's source, counted per unordered source pair
    sql["dup_source_matrix"] = f"""
    WITH pairs AS ({{pairs}}),
    s AS (SELECT doc_id, source FROM documents),
    j AS (
      SELECT sa.source AS sa, sb.source AS sb
      FROM pairs JOIN s sa ON sa.doc_id = pairs.ida
                 JOIN s sb ON sb.doc_id = pairs.idb)
    SELECT least(sa, sb) AS src_a, greatest(sa, sb) AS src_b,
           CAST(count(*) AS BIGINT) AS n_dup_pairs
    FROM j GROUP BY 1, 2
    """.format(pairs=sql["dedup_ngram"])

    # asset metadata: (fmt, width, height) by the same doc_id arithmetic
    # that synthesized the binary headers — no blob parsing in the oracle
    sql["asset_metadata"] = """
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                WHEN 2 THEN 'jpeg' ELSE 'unknown' END AS fmt,
           CASE doc_id % 4 WHEN 0 THEN CAST(doc_id % 640 + 16 AS BIGINT)
                WHEN 1 THEN CAST(doc_id % 320 + 1 AS BIGINT)
                WHEN 2 THEN CAST(doc_id % 500 + 1 AS BIGINT)
                ELSE NULL END AS width,
           CASE doc_id % 4 WHEN 0 THEN CAST(doc_id % 480 + 16 AS BIGINT)
                WHEN 1 THEN CAST(doc_id % 200 + 1 AS BIGINT)
                WHEN 2 THEN CAST(doc_id % 300 + 1 AS BIGINT)
                ELSE NULL END AS height
    FROM documents
    """

    sql["hll_vocab"] = hll_registers_oracle_sql(
        "SELECT g.tok AS value FROM documents, "
        "unnest(string_split(text, ' ')) AS g(tok) WHERE g.tok <> ''"
    )

    # crawl novelty: the exact unigram mirror over the same %10 split
    from augmented_codebase_indexer_spark.operators.dedup import gram_novelty_sql

    sql["crawl_novelty"] = gram_novelty_sql(
        "SELECT doc_id, text FROM documents WHERE doc_id % 10 = 7",
        "SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7",
    )

    # multi-source KG merge: every family reconstructed closed-form and
    # unioned with src tags; srcs = sorted comma-joined distinct tags
    sql["kg_multisource"] = f"""
    WITH openie AS (
      SELECT 'Entity' || (doc_id % 50) AS subj,
             CASE doc_id % 6 WHEN 0 THEN 'acquired' WHEN 1 THEN 'founded_by'
               WHEN 2 THEN 'located_in' WHEN 3 THEN 'partnered_with'
               WHEN 4 THEN 'subsidiary_of' ELSE 'works_for' END AS pred,
             'Entity' || ((doc_id * 7 + 13) % 50) AS obj,
             'openie' AS src
      FROM documents),
    hearst AS (
      SELECT hypo AS subj, pred, hyper AS obj, 'hearst' AS src
      FROM ({_hearst_expected_sql()})),
    jsonld AS (
      SELECT 'Entity' || (doc_id % 50) AS subj, 'instance_of' AS pred,
             'Organization' AS obj, 'jsonld' AS src FROM documents
      UNION ALL
      SELECT 'Author ' || (doc_id % 20), 'instance_of', 'Person', 'jsonld'
      FROM documents WHERE doc_id % 5 = 0),
    webtable AS (
      SELECT 'Entity' || (doc_id % 50) AS subj, 'role' AS pred,
             'R' || (doc_id % 6) AS obj, 'webtable' AS src FROM documents
      UNION ALL
      SELECT 'Entity' || ((doc_id * 7 + 13) % 50), 'role', 'partner',
             'webtable' FROM documents WHERE doc_id % 3 = 0),
    kb AS (
      SELECT DISTINCT 'Entity' || (doc_id % 50) AS subj,
             'instance_of' AS pred, 'Organization' AS obj, 'kb' AS src
      FROM documents),
    allsrc AS (
      SELECT * FROM openie UNION ALL SELECT * FROM hearst
      UNION ALL SELECT * FROM jsonld UNION ALL SELECT * FROM webtable
      UNION ALL SELECT * FROM kb)
    SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS n_obs,
           string_agg(DISTINCT src, ',' ORDER BY src) AS srcs
    FROM allsrc GROUP BY subj, pred, obj
    """

    # sitemap recrawl: entries + fetch log reconstructed with pure
    # integer epoch arithmetic (1767225600 = 2026-01-01T00:00Z; lastmod
    # day = doc_id % 27 + 1; even docs fetched at day doc_id % 31 + 1h)
    from augmented_codebase_indexer_spark.operators.sitemaps import (
        recrawl_candidates_sql,
    )

    _sm_url = ("'https://site' || (doc_id % 7) || '.example.com/p/' || doc_id")
    sql["sitemap_recrawl"] = recrawl_candidates_sql(
        f"SELECT {_sm_url} AS loc, "
        "CAST(1767225600 + (doc_id % 27) * 86400 AS BIGINT) AS lastmod_epoch "
        "FROM documents",
        f"SELECT {_sm_url} AS url, "
        "CAST(1767225600 + (doc_id % 31) * 86400 + 3600 AS BIGINT) "
        "AS fetched_at FROM documents WHERE doc_id % 2 = 0",
    )

    # web tables: closed-form cell reconstruction feeding the relation
    # mirror (row 1 header; every 3rd doc a second data row)
    from augmented_codebase_indexer_spark.operators.webtables import (
        table_relations_sql,
    )

    _wt_url = "'https://docs.example/' || source || '/' || doc_id"
    sql["web_tables"] = table_relations_sql(
        f"SELECT {_wt_url} AS url, 1 AS table_idx, 1 AS row_idx, "
        "1 AS col_idx, 'name' AS cell FROM documents "
        f"UNION ALL SELECT {_wt_url}, 1, 1, 2, 'role' FROM documents "
        f"UNION ALL SELECT {_wt_url}, 1, 2, 1, 'Entity' || (doc_id % 50) "
        "FROM documents "
        f"UNION ALL SELECT {_wt_url}, 1, 2, 2, 'R' || (doc_id % 6) "
        "FROM documents "
        f"UNION ALL SELECT {_wt_url}, 1, 3, 1, "
        "'Entity' || ((doc_id * 7 + 13) % 50) "
        "FROM documents WHERE doc_id % 3 = 0 "
        f"UNION ALL SELECT {_wt_url}, 1, 3, 2, 'partner' "
        "FROM documents WHERE doc_id % 3 = 0"
    )

    _jsonld_url = "'https://docs.example/' || source || '/' || doc_id"
    sql["jsonld_items"] = jsonld_items_sql(
        f"SELECT {_jsonld_url} AS url, 1 AS block_idx, "
        "'{\"@type\":\"Organization\",\"name\":\"Entity' || (doc_id % 50) || "
        "'\",\"url\":\"https://docs.example/e/' || (doc_id % 50) || '\"}' AS raw "
        "FROM documents "
        "UNION ALL "
        f"SELECT {_jsonld_url}, 2, "
        "'{\"@type\":\"Person\",\"name\":\"Author ' || (doc_id % 20) || '\"}' "
        "FROM documents WHERE doc_id % 5 = 0 "
        "UNION ALL "
        f"SELECT {_jsonld_url}, 2, '{{\"@type\":\"Organization\",\"name\":' "
        "FROM documents WHERE doc_id % 10 = 3"
    )
    sql["kg_snapshot"] = scd2_oracle_sql(_TEMPORAL_FACTS_SQL, as_of=_TEMPORAL_AS_OF)

    from augmented_codebase_indexer_spark.operators.temporal import (
        snapshot_diff_oracle_sql,
    )

    sql["kg_snapshot_diff"] = snapshot_diff_oracle_sql(
        _TEMPORAL_FACTS_SQL, _TEMPORAL_AS_OF, _TEMPORAL_T2
    )

    from augmented_codebase_indexer_spark.operators.graphalgs import (
        adamic_adar_oracle_sql,
        jaccard_oracle_sql,
        triangle_oracle_sql,
    )

    sql["graph_triangles"] = triangle_oracle_sql(_entity_graph_sql("duckdb"))
    sql["graph_jaccard"] = jaccard_oracle_sql(_entity_graph_sql("duckdb"), min_common=2)
    sql["graph_adamic_adar"] = adamic_adar_oracle_sql(
        _entity_graph_sql("duckdb"), min_common=2
    )

    from augmented_codebase_indexer_spark.operators.graphalgs import k_core_oracle_sql

    sql["graph_kcore"] = k_core_oracle_sql(_entity_graph_sql("duckdb"), k=6)

    sql["exactsubstr_spans"] = exact_substr_oracle_sql(n=8, min_df=2)
    _h = host_sql_expr("url")
    sql["domain_normalize"] = f"""
    SELECT doc_id, url, {_h} AS host, {domain_sql_expr(_h)} AS domain
    FROM (SELECT doc_id, {_url_expr("duckdb")} AS url FROM documents)
    """
    _h60 = h60_expr("CAST(doc_id AS VARCHAR)", "duckdb")
    sql["domain_cap_url"] = f"""
    SELECT doc_id, domain, domain_rank FROM (
      SELECT doc_id, domain,
             CAST(row_number() OVER (PARTITION BY domain
                  ORDER BY {_h60} ASC, doc_id ASC) AS BIGINT) AS domain_rank
      FROM (SELECT doc_id, {domain_sql_expr(_h)} AS domain
            FROM (SELECT doc_id, source, {_url_expr("duckdb")} AS url
                  FROM documents)))
    WHERE domain_rank <= 3
    """

    sql["training_mix"] = training_mix_oracle_sql(_MIX_BUDGETS)
    sql["data_split"] = hash_split_oracle_sql()
    sql["pack_sequences"] = pack_sequences_oracle_sql(
        budget=128, n_shards=8, chunks_table=f"({chunk_oracle_sql()})"
    )

    from augmented_codebase_indexer_spark.operators.changerate import (
        change_rates_oracle_sql,
    )

    sql["change_rates"] = change_rates_oracle_sql("""
    SELECT 'https://cc.example/p' || CAST(doc_id AS VARCHAR) AS url,
           1700000000 + k * (3600 + doc_id % 7) AS fetch_epoch,
           md5(CAST(doc_id AS VARCHAR) || ':' ||
               CAST((k * (doc_id % 4)) // 3 AS VARCHAR)) AS content_hash
    FROM (SELECT doc_id, unnest(generate_series(0, doc_id % 6 + 1)) AS k
          FROM documents)
    WHERE NOT (doc_id % 13 = 0 AND k > 0)""")

    from augmented_codebase_indexer_spark.operators.entropy import (
        unigram_entropy_oracle_sql,
    )

    sql["unigram_entropy"] = unigram_entropy_oracle_sql(
        "SELECT doc_id, text FROM documents"
    )

    from augmented_codebase_indexer_spark.operators.schedule import (
        fetch_schedule_oracle_sql,
    )

    _sched_queue = """
    SELECT url, host,
           CAST(row_number() OVER (PARTITION BY host ORDER BY url)
                AS BIGINT) AS slot
    FROM (SELECT 'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
                 '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
                 'site' || CAST(doc_id % 7 AS VARCHAR) ||
                 '.example.com' AS host
          FROM documents)"""
    _sched_robots = """
    SELECT 'site' || CAST(dnum AS VARCHAR) || '.example.com' AS domain,
           CASE WHEN dnum % 4 = 0
                THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 2'
                WHEN dnum % 4 = 1
                THEN 'User-agent: *' || chr(10) || 'Crawl-delay: 0.5' ||
                     chr(10) || 'User-agent: aci-bot' || chr(10) ||
                     'Crawl-delay: 3'
                WHEN dnum % 4 = 2
                THEN 'User-agent: *' || chr(10) || 'Crawl-delay: fast'
                ELSE 'User-agent: *' || chr(10) || 'Disallow: /x'
           END AS robots_txt
    FROM (SELECT DISTINCT doc_id % 7 AS dnum FROM documents)"""
    sql["fetch_schedule"] = fetch_schedule_oracle_sql(
        _sched_queue, _sched_robots, agent="aci-bot",
        start_epoch_ms=1_700_000_000_000, default_delay_ms=1000,
    )

    from augmented_codebase_indexer_spark.operators.traps import (
        url_alias_profile_oracle_sql,
    )

    sql["crawl_traps"] = url_alias_profile_oracle_sql("""
    SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example/p/' ||
           CAST(doc_id AS VARCHAR) AS url,
           CASE WHEN doc_id % 5 = 0 THEN 'same-content'
                ELSE md5(CAST(doc_id AS VARCHAR)) END AS content_hash
    FROM documents
    UNION ALL
    SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example/p/' ||
           CAST(doc_id AS VARCHAR) AS url,
           md5(CAST(doc_id AS VARCHAR) || ':v2') AS content_hash
    FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1""")

    from augmented_codebase_indexer_spark.operators.predprofile import (
        predicate_profile_oracle_sql,
    )
    from augmented_codebase_indexer_spark.operators.typeinduction import (
        induce_domain_range_oracle_sql,
        type_violations_oracle_sql,
    )

    sql["kg_pred_profile"] = predicate_profile_oracle_sql(
        _rule_triples_sql("duckdb"))
    sql["kg_schema_induction"] = induce_domain_range_oracle_sql(
        _rule_triples_sql("duckdb"), _kg_types_sql("duckdb"))
    # the incremental form's gate IS the one-shot mirror:
    # batch-boundary invariance as a driver-checked theorem
    sql["kg_schema_induction_incr"] = induce_domain_range_oracle_sql(
        _rule_triples_sql("duckdb"), _kg_types_sql("duckdb"))
    sql["kg_type_violations"] = type_violations_oracle_sql(
        _rule_triples_sql("duckdb"), _kg_types_sql("duckdb"))

    from augmented_codebase_indexer_spark.operators.completeness import (
        class_completeness_oracle_sql,
    )

    sql["kg_completeness"] = class_completeness_oracle_sql(
        _sightings_sql("duckdb"))

    sql["quote_attribution"] = _quote_expected_sql()

    from augmented_codebase_indexer_spark.operators.nameblock import (
        block_candidates_oracle_sql,
        blocking_quality_oracle_sql,
    )

    sql["er_name_blocking"] = block_candidates_oracle_sql(
        _er_names_sql("duckdb"), max_dist=2, block_cap=500)
    sql["er_blocking_quality"] = blocking_quality_oracle_sql(
        _er_names_sql("duckdb"), _er_truth_sql("duckdb"),
        max_dist=2, block_cap=500)

    from augmented_codebase_indexer_spark.operators.vocabgrowth import (
        vocab_growth_oracle_sql,
    )

    sql["vocab_growth"] = vocab_growth_oracle_sql(
        _growth_docs_sql("duckdb"), bucket_docs=50)

    sql["acronym_pairs"] = _acronym_expected_sql()

    sql["kg_schema_publish"] = _kg_schema_publish_oracle_sql()

    from augmented_codebase_indexer_spark.operators.geo import (
        geo_candidates_oracle_sql,
    )

    sql["geo_candidates"] = geo_candidates_oracle_sql(
        _geo_places_sql("duckdb"), radius_micro=100_000)

    sql["date_mentions"] = _datetx_expected_sql()

    from augmented_codebase_indexer_spark.operators.cocitation import (
        cocitation_oracle_sql,
        coupling_oracle_sql,
    )

    sql["graph_cocitation"] = cocitation_oracle_sql(
        _entity_graph_sql("duckdb"), min_common=2)
    sql["graph_coupling"] = coupling_oracle_sql(
        _entity_graph_sql("duckdb"), min_common=2)

    from augmented_codebase_indexer_spark.operators.graphalgs import (
        assortativity_oracle_sql,
    )

    sql["graph_assortativity"] = assortativity_oracle_sql(
        _entity_graph_sql("duckdb"))

    from augmented_codebase_indexer_spark.operators.evaluation import (
        classification_report_oracle_sql,
    )

    _lid_labeled = f"""
    SELECT d.lang AS t, p.lang_pred AS p
    FROM documents d JOIN ({lang_id_oracle_sql(
        ['de', 'en', 'es', 'fr', 'zh'])}) p ON d.doc_id = p.doc_id"""
    sql["lid_confusion"] = classification_report_oracle_sql(_lid_labeled)

    from augmented_codebase_indexer_spark.operators.schemadrift import (
        schema_drift_oracle_sql,
    )

    sql["schema_drift"] = schema_drift_oracle_sql(
        _rule_triples_sql("duckdb"), _rule_triples_b_sql("duckdb"),
        _kg_types_sql("duckdb"))

    from augmented_codebase_indexer_spark.operators.typeprop import (
        propagate_types_oracle_sql,
    )

    sql["type_propagation"] = propagate_types_oracle_sql(
        _alias_edges_sql("duckdb"), _type_seeds_sql("duckdb"), rounds=3)

    sql["microdata_items"] = _microdata_expected_sql()
    sql["og_meta"] = _og_expected_sql()

    from augmented_codebase_indexer_spark.operators.graphalgs import (
        k_truss_oracle_sql,
    )

    sql["graph_ktruss"] = k_truss_oracle_sql(
        _entity_graph_sql("duckdb"), k=3)

    from augmented_codebase_indexer_spark.operators.temporal import (
        temporal_conflicts_oracle_sql,
    )

    _conf_versions = f"""
    SELECT subj, pred, obj, valid_from, valid_to
    FROM ({scd2_oracle_sql(_conflict_facts_sql('duckdb', 'a'))})
    UNION ALL
    SELECT subj, pred, obj, valid_from, valid_to
    FROM ({scd2_oracle_sql(_conflict_facts_sql('duckdb', 'b'))})"""
    sql["temporal_conflicts"] = temporal_conflicts_oracle_sql(
        _conf_versions, ["born_in", "capital_of"])

    from augmented_codebase_indexer_spark.operators.paths import (
        eval_path_sql,
    )

    sql["kg_property_paths"] = eval_path_sql(
        _path_facts_sql("duckdb"), _PATH_AST)

    from augmented_codebase_indexer_spark.operators.changepoint import (
        cusum_alarms_oracle_sql,
    )

    sql["cusum_alarms"] = cusum_alarms_oracle_sql(
        _cusum_daily_sql("duckdb"), h_micro=20_000_000)

    sql["negated_claims"] = _negation_expected_sql()

    from augmented_codebase_indexer_spark.operators.navpaths import (
        path_ngrams_oracle_sql,
    )

    sql["nav_paths"] = path_ngrams_oracle_sql(
        "SELECT event_id, ts, user_id, event_type FROM events",
        n=3, min_count=3)

    from augmented_codebase_indexer_spark.operators.factsummary import (
        entity_fact_summary_oracle_sql,
    )

    sql["entity_fact_summary"] = entity_fact_summary_oracle_sql(
        _path_facts_sql("duckdb"), k=3)

    sql["host_crawl_report"] = _host_report_oracle_sql()

    from augmented_codebase_indexer_spark.operators.calibration import (
        score_calibration_oracle_sql,
    )
    from augmented_codebase_indexer_spark.operators.textstats import (
        quality_micro_sql,
    )

    sql["kv_numeric_facts"] = _kv_expected_sql()

    from augmented_codebase_indexer_spark.operators.qasample import (
        stratified_sample_oracle_sql,
    )

    from augmented_codebase_indexer_spark.operators.canopy import (
        canopy_candidates_oracle_sql,
    )

    sql["er_canopy"] = canopy_candidates_oracle_sql(
        _er_names_sql("duckdb"), max_df=10)

    from augmented_codebase_indexer_spark.operators.mutualbest import (
        mutual_best_matches_oracle_sql,
    )

    sql["er_mutual_best"] = mutual_best_matches_oracle_sql(
        block_candidates_oracle_sql(
            _er_names_sql("duckdb"), max_dist=2, block_cap=500))

    from augmented_codebase_indexer_spark.operators.corpusstats import (
        slice_log_odds_oracle_sql,
    )

    sql["slice_keywords"] = slice_log_odds_oracle_sql("src0", "src1")

    sql["graph_robustness"] = _graph_robustness_oracle_sql()

    sql["qa_sample"] = stratified_sample_oracle_sql(
        f"SELECT DISTINCT subj, pred, obj FROM ({_rule_triples_sql('duckdb')})",
        ["pred"], ["subj", "pred", "obj"], k=5)

    _q_scored_sql = f"""
    SELECT {quality_micro_sql('t.text')} AS score, (c.k > 1) AS label
    FROM (SELECT text, md5(text) AS h FROM documents) t
    JOIN (SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS k
          FROM documents GROUP BY md5(text)) c ON t.h = c.h"""
    sql["quality_calibration"] = score_calibration_oracle_sql(_q_scored_sql)

    from augmented_codebase_indexer_spark.operators.calibration import (
        ranking_auc_oracle_sql,
    )

    sql["quality_auc"] = ranking_auc_oracle_sql(_q_scored_sql)

    from augmented_codebase_indexer_spark.operators.changepoint import (
        ks_drift_oracle_sql,
    )

    from augmented_codebase_indexer_spark.operators.concentration import (
        concentration_oracle_sql,
    )

    sql["source_concentration"] = concentration_oracle_sql(
        "SELECT source AS key, CAST(sum(n_chars) AS BIGINT) AS w"
        " FROM documents GROUP BY source")

    sql["score_drift_ks"] = ks_drift_oracle_sql(
        f"SELECT {quality_micro_sql('text')} AS score FROM documents",
        f"SELECT {quality_micro_sql('text')} AS score"
        " FROM (SELECT text || ' zz zz zz zz zz zz' AS text"
        " FROM documents)")

    # DuckDB's native ASOF JOIN — an independent as-of implementation (our
    # Spark operator is union + carry-forward window)
    sql["asof_join"] = """
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type != 'signup'),
         d AS (SELECT user_id, ts, value FROM events WHERE event_type = 'signup')
    SELECT e.event_id, round(d.value, 6) AS asof_value
    FROM e ASOF LEFT JOIN d ON e.user_id = d.user_id AND e.ts >= d.ts
    """

    return sql
