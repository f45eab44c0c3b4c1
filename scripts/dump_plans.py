"""Dump physical plans of the headline queries to PLANS.md.

The plan-shape guarantees live as assertions in tests/test_plans.py; this
artifact makes them reviewable: for each headline query we record
`.explain(formatted)` plus the properties a 100 TB deployment cares about
(exchange count, Python stage count, pushed filters, read schema width).

    python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF = "/root/testdata/sf0.001"


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def summarize(plan: str) -> str:
    # formatted explain lists each node once in the tree and once in the
    # detail section — count unique node ids; codegen'd nodes carry a '*'
    # (codegen stars are applied at execution under AQE, so they are not
    # countable from the pre-execution formatted plan — the no-Python-node
    # property is what test_plans.py asserts instead)
    n_ex = len(set(re.findall(r"Exchange[^(]*\((\d+)\)", plan)))
    n_py = len(set(re.findall(r"(?:MapInPandas|ArrowEvalPython|BatchEvalPython)[^(]*\((\d+)\)", plan)))
    pushed = "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "no"
    return f"exchanges={n_ex}, python_stages={n_py}, pushed_filters={pushed}"


def _mentions_joins(spark, pages, gaz_rows):
    from pyspark.sql import functions as F

    from augmented_codebase_indexer_spark.operators.extraction import extract_stage
    from augmented_codebase_indexer_spark.operators.mentions_joins import (
        triple_stage_joins,
    )

    gaz_df = spark.createDataFrame(gaz_rows)
    extracted = extract_stage(pages).filter(
        (F.col("lang") == "en") & (F.length("extracted_text") > 0)
    )
    return triple_stage_joins(extracted, gaz_df)


def main() -> None:
    from pyspark.sql import functions as F

    from augmented_codebase_indexer_spark.session import get_spark

    spark = get_spark(app_name="plans", master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    events = spark.read.parquet(f"{SF}/events.parquet")

    from augmented_codebase_indexer_spark.operators.chunking import chunk_documents
    from augmented_codebase_indexer_spark.operators.dedup import (
        minhash_near_duplicates,
        simhash_near_duplicates,
    )
    from augmented_codebase_indexer_spark.operators.ann import (
        brute_force_topk,
        embedding_near_duplicates_lsh,
    )
    from augmented_codebase_indexer_spark.operators.extraction import (
        broadcast_aliases,
        extract_stage,
        triple_stage,
    )
    from augmented_codebase_indexer_spark.operators.linking import (
        broadcast_gazetteer,
        linking_stage,
    )
    from augmented_codebase_indexer_spark.operators.decontam import (
        decontaminate,
        decontaminate_spans,
    )
    from augmented_codebase_indexer_spark.operators.sessions import session_stats
    from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v3
    from augmented_codebase_indexer_spark.sources.pages import (
        derive_pages_from_documents,
        entry_gazetteer_rows,
    )

    pages = derive_pages_from_documents(spark, SF)
    gaz = entry_gazetteer_rows(50)
    alias_bc = broadcast_aliases(spark, [r["alias"] for r in gaz])
    gaz_bc = broadcast_gazetteer(spark, gaz)
    kg = linking_stage(
        triple_stage(
            extract_stage(pages).filter(
                (F.col("lang") == "en") & (F.length("extracted_text") > 0)
            ),
            alias_bc,
        ),
        gaz_bc,
    )

    queries = {
        "kg_pipeline (extract→triples→link)": (
            kg,
            "THE scale property: zero exchanges — the whole spine is one narrow "
            "stage; the gazetteer ships as a broadcast variable, not a join.",
        ),
        "dedup_minhash (banded signature join)": (
            minhash_near_duplicates(docs, threshold=0.5),
            "Exchanges carry (id, sig, band_key) only — document text never "
            "shuffles (round-2 fix; asserted in test_plans.py).",
        ),
        "dedup_simhash": (
            simhash_near_duplicates(docs, max_hamming=10),
            "Signature-only shuffle: one long per row plus the 15-bit chunk key.",
        ),
        "ann_topk (brute tier)": (
            brute_force_topk(emb, [0, 1, 2], k=3),
            "Query side broadcast; cosine is zip_with+aggregate inside codegen.",
        ),
        "dedup_embedding_lsh": (
            embedding_near_duplicates_lsh(emb, threshold=0.5),
            "Sign-signature bands; candidate join shuffles (band_key, id, vec).",
        ),
        "chunking": (
            chunk_documents(docs),
            "Pure per-row flatMap: no exchange, no Python stage.",
        ),
        "kg_mentions_joins (no-broadcast gazetteer tier)": (
            _mentions_joins(spark, pages, gaz),
            "Huge-gazetteer path: slim n-gram candidate rows meet the alias "
            "TABLE in one equi-join; exactly ONE exchange carries text (the "
            "cogroup with selected spans) — asserted in test_plans.py.",
        ),
        "sessionize+stats": (
            session_stats(events),
            "Two windows + groupBy share ONE user_id exchange.",
        ),
        "decontam (vs eval split)": (
            decontaminate(
                docs.filter(F.col("doc_id") % 53 != 0).select("doc_id", "text"),
                docs.filter(F.col("doc_id") % 53 == 0).select("doc_id", "text"),
                n=3,
            ),
            "Eval grams + hit set both BroadcastExchange; the n-gram explode "
            "is narrow, so corpus text never crosses a shuffle.",
        ),
        "curation_v3 (full hygiene chain)": (
            curation_pipeline_v3(docs, decontam_n=3),
            "Boilerplate pays its two segment shuffles up front; PII + Gopher "
            "+ lang fuse into narrow filters; decontam is broadcast-only; the "
            "cleaned text crosses ONE exchange (dedup winner).",
        ),
        "decontam_spans (excise leaked windows)": (
            decontaminate_spans(
                docs.filter(F.col("doc_id") % 53 != 0).select("doc_id", "text"),
                docs.filter(F.col("doc_id") % 53 == 0).select("doc_id", "text"),
                n=3,
            ),
            "Per-position window hashes are narrow; only HIT starts cross the "
            "broadcast join and broadcast back — text never shuffles.",
        ),
    }

    from augmented_codebase_indexer_spark.operators.domains import with_domain
    from augmented_codebase_indexer_spark.operators.exactsubstr import (
        exact_substr_spans,
    )
    from augmented_codebase_indexer_spark.operators.sampling import domain_cap

    queries["exactsubstr_spans (cross-doc substring excision)"] = (
        exact_substr_spans(docs.select("doc_id", "text"), n=8, min_df=2),
        "r4: per-position window hashes narrow; the ONE frequency shuffle "
        "carries (doc_id, gram_h) pairs with partial agg; hit starts come "
        "back through the counted broadcast guard — text never shuffles.",
    )
    queries["domain_cap_url (normalize + quota)"] = (
        domain_cap(
            with_domain(docs.select(
                "doc_id",
                F.concat(F.lit("https://sub"), (F.col("doc_id") % 7).cast("string"),
                         F.lit(".example.com/"), F.col("doc_id").cast("string"))
                .alias("url"))),
            k=3, domain_col="domain",
        ),
        "r4: host/eTLD+1 normalization folds into the scan (literal "
        "IN-lists, no join); the quota pays exactly ONE exchange keyed by "
        "registered domain.",
    )

    from augmented_codebase_indexer_spark.operators.graphalgs import triangle_counts
    from augmented_codebase_indexer_spark.operators.lmquality import lm_cross_entropy
    from augmented_codebase_indexer_spark.operators.temporal import scd2_intervals

    from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v5

    queries["curation_v5 (hygiene chain + CCNet LM stage)"] = (
        curation_pipeline_v5(docs, decontam_n=3),
        "r4: v4's shape plus the LM stage — one reference-slice token "
        "shuffle, per-doc combined rows over the doc_id exchange, and the "
        "75-90% keep-set joined back as slim ids (never broadcast).",
    )
    queries["lm_quality (CCNet perplexity)"] = (
        lm_cross_entropy(
            docs.select("doc_id", "text"),
            docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text"),
        ),
        "r4: vocab build shuffles only the reference slice's tokens; corpus "
        "scoring is explode → broadcast vocab join → partial agg — a doc's "
        "tokens stay in their input partition, so the doc_id exchange "
        "carries ONE combined row per document.",
    )
    queries["triples_scd2 (temporal intervals)"] = (
        scd2_intervals(
            docs.select(
                (F.col("doc_id") % 50).cast("string").alias("subj"),
                (F.col("doc_id") % 6).cast("string").alias("pred"),
                (F.col("doc_id") % 7).cast("string").alias("obj"),
                F.col("doc_id").alias("ts"),
            )
        ),
        "r4: the island windows, run groupBy (superset key) and lead() all "
        "reuse ONE (subj, pred) hash exchange — asserted in "
        "test_temporal.py.",
    )
    queries["graph_triangles (degree-ordered)"] = (
        triangle_counts(
            docs.select(
                (F.col("doc_id") % 151).cast("string").alias("src"),
                ((F.col("doc_id") * 13 + 5) % 151).cast("string").alias("dst"),
            )
        ),
        "r4: degree orientation caps out-degree at O(sqrt(m)) before the "
        "wedge self-join — exchanges carry node-id pairs only.",
    )

    from augmented_codebase_indexer_spark.operators.corpusstats import (
        slice_kl_divergence,
        zipf_profile,
    )
    from augmented_codebase_indexer_spark.operators.langid import lang_id_ngram

    queries["lang_id (char-n-gram LID)"] = (
        lang_id_ngram(docs.select("doc_id", "text", "lang"),
                      langs=["de", "en", "es", "fr", "zh"]),
        "r5: training shuffles only (lang, gram) counts; scoring explodes "
        "grams map-side, joins the guarded-broadcast wide vocab, and "
        "partial-aggregates BEFORE the doc_id exchange — one combined row "
        "per document crosses the wire (the lmquality shape).",
    )
    queries["slice_kl (inter-slice KL divergence)"] = (
        slice_kl_divergence(docs.select("doc_id", "source", "text")),
        "r5: one (source, tok) count shuffle over the corpus; the densified "
        "S×V log-prob frame is slim BIGINT rows self-joined tok-keyed (S "
        "rows per key per side); the pair agg map-side-combines down to "
        "S·(S−1) rows.",
    )
    queries["zipf_profile (token-frequency head)"] = (
        zipf_profile(docs.select("doc_id", "text"), top_n=100),
        "r5: one token count shuffle; global top-N planned as "
        "TakeOrderedAndProject (per-partition top-N merged on the driver, "
        "NOT an unpartitioned window over the vocabulary); the rank/cumsum "
        "window then sees ≤ N rows.",
    )

    from augmented_codebase_indexer_spark.operators.robots import (
        apply_robots,
        parse_robots,
    )

    _robots = spark.createDataFrame(
        [("a.example.com",
          "User-agent: *\nDisallow: /p/1\nAllow: /p/12\n")],
        "domain string, robots_txt string")
    queries["robots_filter (RFC 9309 compliance)"] = (
        apply_robots(
            docs.select("doc_id", F.concat(
                F.lit("https://a.example.com/p/"),
                F.col("doc_id").cast("string")).alias("url")),
            parse_robots(_robots), agent="aci-bot"),
        "r5: rules are O(domains) and ride the counted broadcast guard; "
        "the URL side joins broadcast-side with the LIKE predicate in "
        "codegen, and the verdict is groupBy+min over a sort-key struct "
        "— partial-aggregated map-side, so ONE combined row per url "
        "crosses the exchange (a per-url window would shuffle every "
        "candidate row).",
    )

    from augmented_codebase_indexer_spark.operators.urlnorm import (
        with_canonical_url,
    )

    queries["url_canonical (RFC 3986 normalization)"] = (
        with_canonical_url(docs.select("doc_id", F.concat(
            F.lit("http://Site.example.com:80/p/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_source=x&b=1#f")).alias("url"))),
        "r5: pure string/array builtins — ONE narrow projection fused "
        "into the scan; zero exchanges, zero Python stages.",
    )

    import __spark_entry__ as _entry

    queries["cdx_latest (capture-index selection)"] = (
        _entry.queries()["cdx_latest"](spark, SF),
        "r5: parse is a narrow projection; the newest-OK capture per url "
        "is groupBy+max over a sort-key struct — partial-aggregated "
        "map-side, ONE combined row per url over the single exchange.",
    )

    from augmented_codebase_indexer_spark.operators.kgquality import (
        predicate_profile,
    )

    queries["kg_profile (predicate cardinality QA)"] = (
        predicate_profile(docs.select(
            F.concat(F.lit("e"), (F.col("doc_id") % 101).cast("string"))
            .alias("subj"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("capital_of"))
            .when(F.col("doc_id") % 3 == 1, F.lit("born_in"))
            .otherwise(F.lit("works_at")).alias("pred"),
            (F.col("doc_id") % 11).cast("string").alias("obj"))),
        "r5: counts over fixed-width (pred, subj) keys — map-side "
        "combined partial aggregates; the only exchanges carry "
        "id-and-count rows, never text.",
    )

    queries["kg_truth_fusion (multi-source conflict resolution)"] = (
        _entry.queries()["kg_truth_fusion"](spark, SF),
        "r5b: per round, the trust table rides a counted "
        "BroadcastExchange, the vote is ONE map-side-combined "
        "(subj,pred,obj) exchange of id+count rows, and the winner "
        "argmax is a partial-min(struct) aggregate over ONE (subj,pred) "
        "exchange — no window over an unbounded fact key, no text, no "
        "floats; iteration count is a compile-time constant.",
    )

    queries["hearst_isa (Hearst hypernym extraction)"] = (
        _entry.queries()["hearst_isa"](spark, SF),
        "r5b: ZERO exchanges — regexp_extract_all for all four patterns "
        "fuses into one whole-stage-codegen scan, then explode + group "
        "extraction + list split, all JVM builtins (pytest asserts "
        "'Exchange' not in the plan).",
    )

    queries["kg_domain_range (SHACL-lite domain/range QA)"] = (
        _entry.queries()["kg_domain_range"](spark, SF),
        "r5b: declarations (per-ontology, tiny) auto-broadcast; two "
        "id-keyed joins against slim (node_id, type) rows; the filter "
        "is evaluated pre-projection so conformant rows never "
        "materialize the output columns.",
    )

    queries["kg_publish (fusion → QA-gated publish)"] = (
        _entry.queries()["kg_publish"](spark, SF),
        "r5b: the composed publish chain — the fusion plan above feeds a "
        "LEFT ANTI join against the violation rows; the anti-join key is "
        "the slim (subj, pred, obj) id triple, so the QA gate adds one "
        "id-keyed exchange to the fusion plan and no text movement.",
    )

    queries["taxonomy_closure (Hearst → bounded closure)"] = (
        _entry.queries()["taxonomy_closure"](spark, SF),
        "r5b: the zero-exchange Hearst scan feeds max_hops-1 frontier "
        "equi-joins on fixed-width (id, id) pairs plus one final "
        "groupBy-min for min-hop dedup; the distinct edge set is pinned "
        "once and reused by every hop.",
    )

    queries["anchor_profile (top-k anchor terms per target)"] = (
        _entry.queries()["anchor_profile"](spark, SF),
        "r5c: the html payload dies inside the codegen extraction scan "
        "(regexp_extract_all + explode, zero Python); the two exchanges "
        "downstream carry only (href, tok, count) rows — the rank window "
        "partitions over the COUNTED vocabulary, never raw occurrences "
        "(pytest asserts no html# in any exchange header).",
    )

    queries["redirect_resolve (pointer-doubling chain resolution)"] = (
        _entry.queries()["redirect_resolve"](spark, SF),
        "r5c: Wyllie list-ranking — ceil(log2 max_chain_len)+1 self-joins, "
        "each exchanging fixed-width (src, nxt, hops) pointer rows, lazy "
        "blocks with one materializing action per block and localCheckpoint "
        "lineage cuts; loops surface via one final anti-join against the "
        "open-src set instead of unbounded iteration.",
    )

    queries["comention_pmi (entity association strength)"] = (
        _entry.queries()["comention_pmi"](spark, SF),
        "r5c: distinct (doc, ent) → doc-keyed pair join (per-doc entity "
        "cap raises before it can go quadratic) → algebraic pair/marginal "
        "counts (partial_count before every exchange, hot pairs combine "
        "map-side); marginals re-join through the counted broadcast guard; "
        "the gated PMI is a BIGINT micro-ratio — no float crosses the gate.",
    )

    queries["phrase_search (zero-shuffle exact phrase matching)"] = (
        _entry.queries()["phrase_search"](spark, SF),
        "r5c: within-row array algebra — slice(toks, p, k) == terms over "
        "a position sequence in ONE codegen projection; no inverted "
        "index, no exchange, no Python (pytest asserts Exchange-free).",
    )

    queries["dedup_containment (directed quote/inclusion detection)"] = (
        _entry.queries()["dedup_containment"](spark, SF),
        "r5c: the same gram equi-join + max_df guard as dedup_ngram — "
        "one gram-keyed exchange, never all pairs — with the directed "
        "gate as integer cross-multiply against the contained side.",
    )

    queries["crawl_frontier (canonicalize → robots → politeness slots)"] = (
        _entry.queries()["crawl_frontier"](spark, SF),
        "r5c: composed chain — canonical-form distinct, robots verdict "
        "join (rules via counted broadcast), then the per-host slot "
        "window planned as WindowGroupLimit under the cap filter: "
        "per-host state O(cap) on both sides of the exchange.",
    )

    queries["graph_reciprocity (mutual-link share per node)"] = (
        _entry.queries()["graph_reciprocity"](spark, SF),
        "r5c: distinct edge set → ONE reversed-pair left_semi self-join "
        "of slim (src, dst) ids → two algebraic groupBys (partial_count "
        "map-side); exact BIGINT micro share, self-loops excluded.",
    )

    queries["kg_volatility (per-predicate churn profile)"] = (
        _entry.queries()["kg_volatility"](spark, SF),
        "r5c: one algebraic groupBy over the SCD2 intervals frame — "
        "hot predicates pre-aggregate map-side; exact integer ratios "
        "with a both-engine zero-division guard on the mean duration.",
    )

    queries["jsonld_items (schema.org structured markup)"] = (
        _entry.queries()["jsonld_items"](spark, SF),
        "r5c: one codegen scan regexes JSON-LD blocks in document order "
        "— the html payload dies inside the scan; JSON path extraction "
        "is a builtin projection; malformed blocks surface as NULLs.",
    )

    queries["web_tables (WebTables relation recovery)"] = (
        _entry.queries()["web_tables"](spark, SF),
        "r5c: three chained posexplode levels inside codegen (table → "
        "tr → td/th), then ONE slim (url, table, col)-keyed join pairing "
        "data cells with row-1 headers — no html over any exchange.",
    )

    queries["sitemap_recrawl (changed-since selection)"] = (
        _entry.queries()["sitemap_recrawl"](spark, SF),
        "r5c: codegen url-block explode + UTC epoch parse, then one "
        "url-keyed left join of slim (url, epoch) rows against the "
        "fetch log; verdicts are pure CASE arithmetic.",
    )

    queries["kg_multisource (five-family provenance merge)"] = (
        _entry.queries()["kg_multisource"](spark, SF),
        "r5c: three live extraction chains (Hearst regex, JSON-LD, "
        "web-table recovery) + planted OpenIE + KB priors union into "
        "one (subj, pred, obj) groupBy — the merge is a single "
        "map-side-combined exchange of fact keys + src tags.",
    )

    queries["crawl_novelty (per-doc never-seen gram share)"] = (
        _entry.queries()["crawl_novelty"](spark, SF),
        "r5c: distinct grams both sides, one gram-keyed LEFT ANTI join, "
        "two algebraic counts; gated share is BIGINT cross-multiply.",
    )

    queries["hll_vocab (mergeable distinct-count sketch)"] = (
        _entry.queries()["hll_vocab"](spark, SF),
        "r5c: md5-hex register expressions inside codegen, then an "
        "algebraic max-per-bucket aggregate — partial_max collapses "
        "each partition to ≤64 rows before the single exchange.",
    )

    queries["tfidf_keywords (top-k characteristic terms)"] = (
        _entry.queries()["tfidf_keywords"](spark, SF),
        "r5c: tf and df are map-side-combined groupBys; idf joins back "
        "through the counted broadcast guard; the per-doc top-k filter "
        "plans as WindowGroupLimit (O(k) state per doc).",
    )

    queries["feed_items (RSS/Atom discovery parsing)"] = (
        _entry.queries()["feed_items"](spark, SF),
        "r5c: per-feed item explode + field regexes in one codegen "
        "projection; dates via try_to_timestamp (NULL on bad input, "
        "no task failure).",
    )

    queries["dedup_ngram_prefix (PPJoin prefix-filtered tier)"] = (
        _entry.queries()["dedup_ngram_prefix"](spark, SF),
        "r5c: the candidate self-join reads PREFIXES only (rarest-first "
        "per-doc window, bounded by each doc's gram count — no "
        "unpartitioned window); verification joins are candidate-"
        "bounded and key on (id, gram); output == plain tier by the "
        "prefix-filtering theorem.",
    )

    queries["cm_sketch (sum-mergeable frequency sketch)"] = (
        _entry.queries()["cm_sketch"](spark, SF),
        "r5c: md5 bucket expressions in codegen, then an algebraic "
        "count aggregate — each partition contributes at most d*w rows "
        "to the single exchange; sketches merge by groupBy-sum.",
    )

    queries["asset_metadata (codec-free binary headers)"] = (
        _entry.queries()["asset_metadata"](spark, SF),
        "r5c: hex/conv byte arithmetic inside one codegen projection — "
        "no Python, no exchange, no image library; NULLs for "
        "truncated/unknown payloads.",
    )

    queries["bloom_vocab (OR-mergeable membership sketch)"] = (
        _entry.queries()["bloom_vocab"](spark, SF),
        "r5c: md5 bit expressions in codegen, then a distinct over "
        "<=512 bit values — partial aggregation collapses each "
        "partition before the exchange; sketches merge by union.",
    )

    queries["dup_source_matrix (cross-source syndication report)"] = (
        _entry.queries()["dup_source_matrix"](spark, SF),
        "r5c: the guarded near-dup pair set joins back to (doc_id, "
        "source) twice — slim id-keyed joins — then one combined "
        "source-pair count exchange.",
    )

    queries["lm_vocab (libm-free intlog register table)"] = (
        _entry.queries()["lm_vocab"](spark, SF),
        "r6: the fixed-point BIGINT log is a 97-step projection CHAIN "
        "(one step per select — a flat expression tree would square at "
        "every self-referencing step); evaluated once per VOCAB row "
        "(post-aggregation), so the per-row cost sits on the small side "
        "of the shuffle. No libm anywhere in the gate.",
    )

    queries["bm25_search (exact-integer Okapi BM25)"] = (
        _entry.queries()["bm25_search"](spark, SF),
        "r6: three narrow aggregations (dl, tf-over-query-terms-only — "
        "filtered BEFORE the shuffle, df); idf through intlog on the "
        "term-count-sized frame; broadcast idf join; top-k plans as "
        "TakeOrderedAndProject; the post-limit rank window holds <= k "
        "rows.",
    )

    queries["er_matches (blocked entity resolution)"] = (
        _entry.queries()["er_matches"](spark, SF),
        "r6: block-keyed SELF-join — names only ever pair within a "
        "block (the blocking contract); oversized blocks are dropped "
        "whole through the counted size gate (observable via "
        "oversized_blocks); levenshtein/contains are JVM built-ins in "
        "codegen, no UDF.",
    )

    queries["curation_v6 (trained-LID hygiene chain)"] = (
        _entry.queries()["curation_v6"](spark, SF),
        "r6: v5 with the char-n-gram LID keep-set joined doc_id-keyed "
        "(slim rows, never broadcast — it can be ~90% of the corpus); "
        "LID training is one gram-keyed shuffle over the labeled slice.",
    )

    queries["proximity_search (positional postings k-way join)"] = (
        _entry.queries()["proximity_search"](spark, SF),
        "r6: per-(doc,term) position cap via a doc+term-partitioned "
        "window (never global); each query term adds ONE doc-keyed join "
        "pruned immediately by the window predicate; min-span groupBy "
        "partial-aggregates map-side.",
    )

    queries["graph_walks (hash-chosen DeepWalk corpus)"] = (
        _entry.queries()["graph_walks"](spark, SF),
        "r6: neighbor indexing is one node-partitioned window; each of "
        "the walk_len steps is one equi-join of the slim frontier "
        "against the indexed adjacency (co-located under node "
        "bucketing); the md5 choice runs in codegen — no RNG state, no "
        "driver loop, no Python.",
    )

    queries["paragraph_dedup (RefinedWeb line dedup)"] = (
        _entry.queries()["paragraph_dedup"](spark, SF),
        "r6b: the first-occurrence vote groups by md5(para) with "
        "map-side partial min(struct) — a 10^9-times-repeated banner "
        "crosses the exchange as one combiner row per partition; the "
        "keep-join is the only text-carrying exchange (hash-keyed, AQE "
        "skew-splittable); reassembly is per-doc collect_list.",
    )

    queries["lpa_communities (sync label propagation)"] = (
        _entry.queries()["lpa_communities"](spark, SF),
        "r6b: fixed rounds; per round one node-keyed equi-join of the "
        "slim (node, lbl) relation + two map-side-combinable groupBys; "
        "argmax as min(struct(-cnt, lbl)) — no per-node window, no hot "
        "partition on celebrity nodes.",
    )

    queries["kg_bgp_match (SPARQL BGP join tree)"] = (
        _entry.queries()["kg_bgp_match"](spark, SF),
        "r6b: each pattern is a constant-filtered slim projection; "
        "joins are plain Catalyst equi-joins (AQE broadcasts selective "
        "patterns); disconnected patterns are REJECTED, not planned.",
    )

    queries["mention_commonness (wikification prior)"] = (
        _entry.queries()["mention_commonness"](spark, SF),
        "r6b: (mention, href) pair counts combine map-side; the rank "
        "window runs over DISTINCT candidates per mention "
        "(vocabulary-bounded, never raw link occurrences).",
    )

    queries["daily_bursts (integer ratio-test trending)"] = (
        _entry.queries()["daily_bursts"](spark, SF),
        "r6b: raw events collapse at the (key, day) combiner before "
        "their only exchange; totals aggregate day-sized rows; the day "
        "count is a 1-row broadcast crossJoin. No windows, no floats.",
    )

    queries["kg_negatives (filtered TransE corruption)"] = (
        _entry.queries()["kg_negatives"](spark, SF),
        "r6b: per-predicate pool indexed once (window over the DISTINCT "
        "object vocabulary); generation = explode(k) + one (pred, idx) "
        "equi-join + one left-anti against the edge set; md5 choice in "
        "codegen — no RNG state across executors.",
    )

    queries["walk_skipgrams (SGNS pair counts)"] = (
        _entry.queries()["walk_skipgrams"](spark, SF),
        "r6b: self-join keyed by (start_node, walk) — the key the walk "
        "generator emitted, so it co-locates; band filter bounds per-walk "
        "fan-out; counts combine map-side.",
    )

    queries["graph_hits (integer max-norm HITS)"] = (
        _entry.queries()["graph_hits"](spark, SF),
        "r6b: each half-step shuffles only the slim (node, score) "
        "relation; the max renormalizer is a 1-row broadcast; fixed "
        "rounds bound the lineage.",
    )

    queries["predicate_alignment (extension-overlap Jaccard)"] = (
        _entry.queries()["predicate_alignment"](spark, SF),
        "r6b: (subj, obj)-keyed self-join rides the subject-hash "
        "bucketing; sizes join back as a predicate-vocabulary broadcast.",
    )

    queries["clustering_coeff (Watts-Strogatz local cc)"] = (
        _entry.queries()["clustering_coeff"](spark, SF),
        "r6b: composes the degree-oriented triangle wedge join with "
        "degrees; one node-keyed left join, one trunc division — "
        "nothing new shuffles beyond the triangle tier.",
    )

    queries["audio_metadata (RIFF/WAVE chunk walk)"] = (
        _entry.queries()["audio_metadata"](spark, SF),
        "r6b: bounded 8-chunk walk, one alias per chained select (the "
        "JPEG-walk discipline); pure byte arithmetic in codegen, no "
        "Python, malformation → NULL.",
    )

    queries["video_metadata (ISO-BMFF box walks)"] = (
        _entry.queries()["video_metadata"](spark, SF),
        "r6b: two bounded box walks (top-level → moov, nested → mvhd "
        "v0); to-EOF/largesize/v1 declared unparsed, never wrong.",
    )

    queries["kg_literals (object-literal typing)"] = (
        _entry.queries()["kg_literals"](spark, SF),
        "r6b: regex-gated typing + string-arithmetic decimal parsing in "
        "ONE codegen projection — no shuffle, no Python, no UDF.",
    )

    queries["allen_relations (13-relation interval classify)"] = (
        _entry.queries()["allen_relations"](spark, SF),
        "r6b: key-equi-join + an exhaustive integer CASE ladder; pair "
        "fan-out bounded by versions-per-key squared.",
    )

    queries["snippet_search (read-path extracts)"] = (
        _entry.queries()["snippet_search"](spark, SF),
        "r6b: proximity hits + ONE doc_id-keyed join for the clamped "
        "token slice; only matching docs re-tokenize.",
    )

    queries["robots_sitemaps (crawl-chain discovery link)"] = (
        _entry.queries()["robots_sitemaps"](spark, SF),
        "r6b: split+explode per robots file in codegen; the only "
        "exchange is the final distinct.",
    )

    queries["event_funnel (strict-order funnel)"] = (
        _entry.queries()["event_funnel"](spark, SF),
        "r6b: per-step filtered min-groupBys (map-side combined) + "
        "user-keyed left joins with the step predicate IN the join; no "
        "windows, the raw stream is never self-joined.",
    )

    queries["retention_cohorts (weekly activity cohorts)"] = (
        _entry.queries()["retention_cohorts"](spark, SF),
        "r6c: raw events collapse to DISTINCT (user, week) map-side; "
        "cohort assignment is a user-keyed min-agg + same-key join "
        "(exchange reused); the final grid is weeks×offsets-sized. "
        "Integer week indices from a fixed epoch — no date_trunc "
        "week-start convention.",
    )

    queries["event_transitions (Markov first-order matrix)"] = (
        _entry.queries()["event_transitions"](spark, SF),
        "r6c: per-user ordered pairs via one user-keyed window (state "
        "= lead(etype)), then a map-side-combined (from, to) count; "
        "probabilities as trunc-division micro units.",
    )

    queries["readability (LIX/RIX surface indices)"] = (
        _entry.queries()["readability"](spark, SF),
        "r6c: one narrow codegen projection — split/regexp counts per "
        "row, zero exchanges, zero Python; 10^12 docs cost one scan.",
    )

    queries["collocations (Dunning G2 bigrams)"] = (
        _entry.queries()["collocations"](spark, SF),
        "r6c: bigram pairs built array-side in codegen (token rows "
        "never explode unpaired); three map-side-combined counts + "
        "two vocabulary-keyed joins; every ln is the libm-free intlog.",
    )

    queries["url_param_rules (tracking-param rule mining)"] = (
        _entry.queries()["url_param_rules"](spark, SF),
        "r6c: per-url param explode (key-vocabulary bounded), one "
        "(key, residual) groupBy carrying only group stats, one "
        "key-sized final agg — NO joins; page content never rides "
        "the residual key.",
    )

    queries["host_boilerplate (per-host template paragraphs)"] = (
        _entry.queries()["host_boilerplate"](spark, SF),
        "r6c: DISTINCT (host, para, doc) collapses map-side, one "
        "(host, para) groupBy, host totals join back broadcast; the "
        "verdict is an integer cross-multiply share gate.",
    )

    queries["entity_salience (aboutness rank per page)"] = (
        _entry.queries()["entity_salience"](spark, SF),
        "r6c: one (doc, entity) groupBy collapses the mention stream "
        "map-side; doc totals reuse the leading key; the rank window "
        "is doc-partitioned (entities-per-doc state). No text anywhere.",
    )

    queries["span_coverage (union length per doc)"] = (
        _entry.queries()["span_coverage"](spark, SF),
        "r6c: the overlap-safe sweep — ONE doc-partitioned running-max "
        "window + one map-side-combinable groupBy; never the quadratic "
        "span self-join; only per-doc sums (tie-order invariant) gate.",
    )

    queries["extractor_kappa (chance-corrected agreement)"] = (
        _entry.queries()["extractor_kappa"](spark, SF),
        "r6c: one item-keyed equi-join, label-vocabulary marginal "
        "aggs joined on the label key, single-row BIGINT fold.",
    )

    queries["webtable_types (strict-majority column typing)"] = (
        _entry.queries()["webtable_types"](spark, SF),
        "r6c: typing rules fuse into the cell scan (codegen), one "
        "(header, type) groupBy (≤5 rows/header after map-side "
        "combine), argmax via min(struct) — no window.",
    )

    queries["kg_shortest_paths (fixed-round Bellman-Ford)"] = (
        _entry.queries()["kg_shortest_paths"](spark, SF),
        "r6c: per round one src-keyed equi-join of the slim "
        "(node, dist) frontier + a min-groupBy; statically bounded "
        "plan depth, restartable per round.",
    )

    queries["wlm_relatedness (link-overlap semantic relatedness)"] = (
        _entry.queries()["wlm_relatedness"](spark, SF),
        "r6c: candidates from ONE linker-keyed self-join (hub linkers "
        "pruned first), every ln evaluated once per DISTINCT count "
        "value via intlog and broadcast back — the pair table never "
        "carries a 44-step log chain.",
    )

    queries["kg_symmetry (SymmetricProperty QA)"] = (
        _entry.queries()["kg_symmetry"](spark, SF),
        "r6c: distinct facts of the symmetric-predicate family (pushed "
        "predicate filter), then ONE reversed-key left-anti self-join.",
    )

    queries["host_lang_profile (per-host LID consistency)"] = (
        _entry.queries()["host_lang_profile"](spark, SF),
        "r6c: one (host, lang) groupBy collapses the corpus map-side, "
        "one host-keyed min(struct) argmax — no window, no join back.",
    )

    queries["page_meta (index-gate html metadata)"] = (
        _entry.queries()["page_meta"](spark, SF),
        "r6c: title/canonical/robots/refresh in ONE codegen projection "
        "— the html dies inside the scan; backslash-free patterns are "
        "byte-identical in both engines (regex-parity oracle).",
    )

    queries["heading_outline (h1-h3 section tree)"] = (
        _entry.queries()["heading_outline"](spark, SF),
        "r6c: one regexp_extract_all + posexplode, parents from "
        "per-level running-max windows (url-partitioned) — no "
        "self-join; headings-per-page window state.",
    )

    queries["retrieval_triplets (anchor-text contrastive tuples)"] = (
        _entry.queries()["retrieval_triplets"](spark, SF),
        "r6c: (query, pos) pairs collapse map-side; negatives drawn "
        "by md5 hash mod the indexed target pool (vocabulary-bounded "
        "window, the negatives.py trade); false negatives dropped by "
        "one left-anti join.",
    )

    queries["entity_disambig (Milne-Witten coherence)"] = (
        _entry.queries()["entity_disambig"](spark, SF),
        "r6c: the wikification composition — priors and relatedness "
        "are vocabulary-sized pinned frames; mention-scale joins are "
        "surface- and doc-keyed with vocabulary-bounded fan-out; the "
        "winner argmax is min(struct) on the aggregated score frame.",
    )

    queries["crawl_budget (Hamilton apportionment)"] = (
        _entry.queries()["crawl_budget"](spark, SF),
        "r6c: host-cardinality-sized throughout — quota arithmetic in "
        "one projection, one host-table window for the largest-"
        "remainder ranking, Σalloc = budget exactly.",
    )

    queries["url_path_rollup (site-structure tree)"] = (
        _entry.queries()["url_path_rollup"](spark, SF),
        "r6c: bounded explode (≤ depth+1 rows/url) into one "
        "(host, prefix) groupBy with map-side combine — no joins, "
        "no windows; query strings pruned before the prefix.",
    )

    queries["rake_keyphrases (doc-local degree/freq phrases)"] = (
        _entry.queries()["rake_keyphrases"](spark, SF),
        "r6c: everything rides the doc_id key — two nested explodes "
        "in codegen, doc-partitioned run/length windows, two doc-keyed "
        "aggs; runs over the REAL document text.",
    )

    queries["hreflang_recip (alternate-cluster QA)"] = (
        _entry.queries()["hreflang_recip"](spark, SF),
        "r6c: html dies in the scan; reciprocity is one reversed-key "
        "left join over the distinct (url, alt_url) edge set.",
    )

    queries["host_link_profile (link-spam features)"] = (
        _entry.queries()["host_link_profile"](spark, SF),
        "r6c: url edges collapse to the host graph at the first "
        "DISTINCT; features + one reversed-key semi-join, all "
        "host-cardinality-sized.",
    )

    queries["kg_rule_mining (AMIE-lite PCA confidence)"] = (
        _entry.queries()["kg_rule_mining"](spark, SF),
        "r6c: support from ONE (s,o)-keyed self-join of distinct "
        "facts, PCA denominator from one subject-keyed existence "
        "join — predicate-vocab² rows after map-side combine.",
    )

    queries["sitemap_index (sitemapindex recursion level)"] = (
        _entry.queries()["sitemap_index"](spark, SF),
        "r6c: one codegen explode per index file, lastmod leniency "
        "contract shared with parse_sitemap; regex-parity oracle.",
    )

    queries["fertility_stats (per-slice token planning)"] = (
        _entry.queries()["fertility_stats"](spark, SF),
        "r6c: one projection + one slice-keyed groupBy with map-side "
        "combine over the REAL corpus; aggregate-then-divide ratios.",
    )

    queries["syndication_source (first-seen attribution)"] = (
        _entry.queries()["syndication_source"](spark, SF),
        "r6c: dedup pairs → existing min-label CC (localCheckpoint "
        "blocks) → one component-keyed min(struct) election + one "
        "join back.",
    )

    queries["canonical_resolve (canonical-chain collapse)"] = (
        _entry.queries()["canonical_resolve"](spark, SF),
        "r6c: page_meta codegen extraction feeding the existing "
        "pointer-doubling resolver — canonical chains collapse in "
        "O(log n) rounds exactly like redirect chains.",
    )

    queries["change_rates (Cho-GM recrawl cadence)"] = (
        _entry.queries()["change_rates"](spark, SF),
        "r6d: one url-keyed window + one url-keyed agg over the fetch "
        "log; the intlog chain runs over the distinct (n, n-X) "
        "vocabulary only and joins back broadcast.",
    )

    queries["fetch_schedule (Crawl-delay politeness slots)"] = (
        _entry.queries()["fetch_schedule"](spark, SF),
        "r6d: delays are O(domains) behind the counted broadcast "
        "guard; the schedule is one broadcast join + one codegen "
        "projection over existing slots — no new window.",
    )

    queries["crawl_traps (URL-aliasing trap profile)"] = (
        _entry.queries()["crawl_traps"](spark, SF),
        "r6d: url text dies at the (host, hash) aggregate (map-side "
        "combined); the host fold is counts + one trunc division. "
        "No window, no join.",
    )

    queries["kg_pred_profile (AMIE functionality profile)"] = (
        _entry.queries()["kg_pred_profile"](spark, SF),
        "r6d: one distinct, one (pred, subj) aggregate (map-side "
        "combined), one pred-grain fold. No window, no join beyond "
        "the pred-vocab-sized obj-side merge.",
    )

    queries["kg_completeness (Chao1 capture-recapture)"] = (
        _entry.queries()["kg_completeness"](spark, SF),
        "r6d: dedup at (class, entity, src), one (class, entity) "
        "aggregate (map-side combined, src ids die at the combiner), "
        "one class-grain fold. No window, no join.",
    )

    queries["quote_attribution (speech-verb frames)"] = (
        _entry.queries()["quote_attribution"](spark, SF),
        "r6d: regexp_extract_all + zip_with + explode per frame, "
        "unioned — one narrow codegen scan, zero UDFs, zero "
        "shuffles; quote text leaves the scan only as extracted "
        "spans.",
    )

    queries["er_name_blocking (two-end keys + Levenshtein)"] = (
        _entry.queries()["er_name_blocking"](spark, SF),
        "r6d: keys explode x2, count-gated blocks, one key-grain "
        "self-join bounded by block_cap^2 per key, pair dedup, "
        "builtin levenshtein verification — no UDF, no cartesian.",
    )

    queries["vocab_growth (Heaps curve + intlog beta)"] = (
        _entry.queries()["vocab_growth"](spark, SF),
        "r6d: one (doc-bucket) occurrence agg + one (tok) first-seen "
        "agg, both map-side combined; everything after runs at "
        "checkpoint cardinality, so the unpartitioned window is over "
        "a bounded frame by construction.",
    )

    queries["geo_candidates (grid blocking + integer verify)"] = (
        _entry.queries()["geo_candidates"](spark, SF),
        "r6d: probe side explodes x9 cells, one cell-keyed equi-join "
        "bounded by cell occupancy, exact BIGINT distance gate at "
        "candidate grain — no cross join, no trig, no float.",
    )

    queries["type_propagation (clamped label spreading)"] = (
        _entry.queries()["type_propagation"](spark, SF),
        "r6d: per round one adjacency join against the slim typed "
        "frame, one map-side-combined vote agg, argmax as "
        "groupBy-min(struct), anti-join clamp; localCheckpoint per "
        "round keeps lineage flat (LogicalRDD leaves visible).",
    )

    queries["er_canopy (DF-gated rare-token blocking)"] = (
        _entry.queries()["er_canopy"](spark, SF),
        "r6d: tokenize + distinct, df count gate, one token-keyed "
        "self-join bounded by max_df^2 per token, pair aggregate — "
        "the reordered-name recall tier next to the two-end keys.",
    )

    queries["quality_auc (doubled-midrank Mann-Whitney)"] = (
        _entry.queries()["quality_auc"](spark, SF),
        "r6d: one (score) map-side agg; the cumulative window runs "
        "at distinct-score grain (bounded ~1e6 by micro "
        "quantization), then a single global fold.",
    )

    queries["host_crawl_report (3-screen composition)"] = (
        _entry.queries()["host_crawl_report"](spark, SF),
        "r6d: trap/drain/budget screens each fold data-sized inputs "
        "to host grain inside their own operators; the report is two "
        "full-outer joins over host-cardinality rows.",
    )

    queries["kg_property_paths (dual-target path algebra)"] = (
        _entry.queries()["kg_property_paths"](spark, SF),
        "r6d: every combinator an equi-join/union on slim (subj, obj) "
        "pairs; predicate selection prunes at the scan; bounded plus "
        "is k-1 co-partitioned joins.",
    )

    queries["entity_fact_summary (LinkSUM rarity top-k)"] = (
        _entry.queries()["entity_fact_summary"](spark, SF),
        "r6d: pred-df broadcast onto facts, subject-partitioned "
        "top-k planned as WindowGroupLimit (rank pushdown asserted "
        "in-session: only k rows per subject survive the exchange).",
    )

    queries["cusum_alarms (prefix-sum/running-min identity)"] = (
        _entry.queries()["cusum_alarms"](spark, SF),
        "r6d: one series-partitioned window pass (running sum + "
        "running min), one map-side mu aggregate; no unpartitioned "
        "window, no recursion.",
    )

    queries["temporal_conflicts (merged-SCD2 functional check)"] = (
        _entry.queries()["temporal_conflicts"](spark, SF),
        "r6d: two SCD2 chains then a (subj, pred) self-join "
        "co-partitioned on the key SCD2 already shuffles on; "
        "constant-width interval predicate.",
    )

    queries["kg_schema_publish (measure->induce->gate loop)"] = (
        _entry.queries()["kg_schema_publish"](spark, SF),
        "r6d: induction folds to pred-vocab rows, declarations ride a "
        "broadcast into the conformance join, violations anti-join "
        "back at fact grain — the learned schema gates publish with "
        "no hand-written constraint.",
    )

    queries["kg_schema_induction (SDType domain/range)"] = (
        _entry.queries()["kg_schema_induction"](spark, SF),
        "r6d: type joins at entity grain, counting collapses to "
        "pred-vocab x type-vocab map-side; argmax is groupBy-min "
        "(one combined row per pred over the exchange, no window).",
    )

    queries["unigram_entropy (information-density screen)"] = (
        _entry.queries()["unigram_entropy"](spark, SF),
        "r6d: tokenize -> (doc,tok) groupBy (map-side combined) -> "
        "doc-keyed fold; token text never survives the first groupBy; "
        "two broadcast joins against the count-vocabulary ln table.",
    )

    out = [
        "# PLANS — physical-plan audit of the headline queries\n",
        "Generated by `python scripts/dump_plans.py` (sf0.001 inputs; plan\n"
        "SHAPE is scale-invariant — row counts change, operators don't).\n"
        "Machine-checked versions of these properties run in tests/test_plans.py.\n",
    ]
    for name, (df, note) in queries.items():
        plan = formatted(df)
        out.append(f"\n## {name}\n\n{note}\n\n`{summarize(plan)}`\n")
        out.append("```\n" + plan.strip()[:4000] + "\n```\n")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
