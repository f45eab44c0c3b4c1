"""Corpus-level curation filters: cross-doc boilerplate segment removal and
within-doc repetition stats."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.curation_filters import (
    boilerplate_prune,
    repetition_stats,
)


def test_boilerplate_prune_removes_cross_doc_segments(spark):
    banner = "subscribe to our newsletter today"
    rows = [(i, f"unique fact number {i}. {banner}. more text {i}") for i in range(6)]
    rows.append((99, "a document with no boilerplate at all"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in boilerplate_prune(df, min_df=3).collect()}
    for i in range(6):
        assert banner not in out[i]["clean_text"]
        assert out[i]["clean_text"] == f"unique fact number {i}. more text {i}"
        assert out[i]["n_removed"] == 1 and out[i]["n_kept"] == 2
    # unique content untouched
    assert out[99]["n_removed"] == 0
    assert out[99]["clean_text"] == "a document with no boilerplate at all"


def test_boilerplate_prune_all_removed_doc_survives_empty(spark):
    df = spark.createDataFrame(
        [(i, "same text everywhere") for i in range(5)], "doc_id long, text string"
    )
    out = boilerplate_prune(df, min_df=3).collect()
    assert len(out) == 5
    assert all(r["clean_text"] == "" and r["n_kept"] == 0 and r["n_removed"] == 1
               for r in out)


def test_incremental_boilerplate_equals_batch(spark):
    """The maintained segment-df state reproduces the full-corpus pass:
    build the state over two batches (plus a delete), then prune — output
    must be byte-identical to boilerplate_prune over the same final
    corpus in one shot."""
    from augmented_codebase_indexer_spark.operators.curation_filters import (
        boilerplate_prune_with_state,
        update_segment_df,
    )

    banner = "subscribe to our newsletter today"
    batch1 = spark.createDataFrame(
        [(i, f"unique fact {i}. {banner}. tail {i}") for i in range(4)],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [(i, f"fresh item {i}. {banner}") for i in range(10, 14)],
        "doc_id long, text string",
    )
    removed = batch1.filter(F.col("doc_id") == 3)
    corpus = batch1.unionByName(batch2).filter(F.col("doc_id") != 3)

    state = update_segment_df(None, added=batch1)
    state = update_segment_df(state, added=batch2, removed=removed)
    incr = {r["doc_id"]: r for r in
            boilerplate_prune_with_state(corpus, state, min_df=3).collect()}
    full = {r["doc_id"]: r for r in boilerplate_prune(corpus, min_df=3).collect()}
    assert set(incr) == set(full)
    for k in full:
        assert incr[k]["clean_text"] == full[k]["clean_text"]
        assert incr[k]["n_removed"] == full[k]["n_removed"]
    # state reflects the delete: doc 3's unique segments are gone
    segs = {r["seg"]: r["df"] for r in state.collect()}
    assert "unique fact 3" not in segs
    assert segs[banner] == 7  # 3 live batch1 docs + 4 batch2 docs


def test_incremental_reclean_via_crossed_segments(spark):
    """Full incremental protocol: batch 1 is cleaned when the banner is
    still rare (df < min_df → kept); batch 2 pushes it over the threshold.
    crossed_segments flags the banner, affected_doc_ids names exactly the
    batch-1 docs carrying it, and re-pruning those with the new state
    converges to the one-shot full-corpus result."""
    from augmented_codebase_indexer_spark.operators.curation_filters import (
        affected_doc_ids,
        boilerplate_prune_with_state,
        crossed_segments,
        update_segment_df,
    )

    banner = "subscribe to our newsletter today"
    batch1 = spark.createDataFrame(
        [(1, f"alpha fact one. {banner}"), (2, "bravo fact two. nothing shared")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [(i, f"charlie item {i}. {banner}") for i in range(10, 13)],
        "doc_id long, text string",
    )
    state1 = update_segment_df(None, added=batch1)
    out1 = {r["doc_id"]: r for r in
            boilerplate_prune_with_state(batch1, state1, min_df=3).collect()}
    assert banner in out1[1]["clean_text"]  # correctly kept at df=1

    state2 = update_segment_df(state1, added=batch2)
    crossed = crossed_segments(state1, state2, min_df=3)
    assert {r["seg"] for r in crossed.collect()} == {banner}
    redo = {r["doc_id"] for r in affected_doc_ids(batch1, crossed).collect()}
    assert redo == {1}  # doc 2 untouched — no flipped segment in it

    corpus = batch1.unionByName(batch2)
    incr = {r["doc_id"]: r for r in boilerplate_prune_with_state(
        batch1.filter(F.col("doc_id").isin(list(redo))).unionByName(batch2),
        state2, min_df=3).collect()}
    incr[2] = out1[2]  # unaffected doc keeps its batch-1 result
    full = {r["doc_id"]: r for r in boilerplate_prune(corpus, min_df=3).collect()}
    assert set(incr) == set(full)
    for k in full:
        assert incr[k]["clean_text"] == full[k]["clean_text"], k


def test_repetition_stats_fractions(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # 2-grams: [ab, ba, ab, ba, ab] → 2/5 distinct
            (2, "all words here are distinct tokens"),
            (3, "x"),                     # too short for any gram
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert abs(out[1]["dup_2gram_frac"] - (1 - 2 / 5)) < 1e-6
    assert out[2]["dup_2gram_frac"] == 0.0 and out[2]["dup_3gram_frac"] == 0.0
    assert out[3]["dup_2gram_frac"] == 0.0 and out[3]["n_tokens"] == 1
    # 3-grams of doc 1: [aba, bab, aba, bab] → 2/4 distinct
    assert abs(out[1]["dup_3gram_frac"] - 0.5) < 1e-6


def test_curation_v2_judges_on_cleaned_text(spark):
    """A page that is mostly boilerplate must be scored (and chunked) on its
    real content: the banner is stripped before the quality/repetition
    filters, so a junk page carried by boilerplate drops out while a good
    page buried under the same banner survives."""
    from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v2

    banner = "subscribe to our newsletter and accept all cookies right now please"
    good_body = "the quick brown fox jumps over the lazy dog near the river bank today"
    junk_body = "buy buy buy buy buy buy buy buy buy buy"
    rows = [(i, f"{banner}. filler row {i}") for i in range(5)]          # banner-only
    rows.append((10, f"{banner}. {good_body}"))                          # good + banner
    rows.append((11, f"{banner}. {junk_body}"))                          # repetitive + banner
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation_pipeline_v2(
        df, min_quality=0.0, allowed_langs=("en",), size=5, overlap=0,
        boiler_min_df=3, max_dup_2gram=0.3,
    ).collect()
    kept_ids = {r["doc_id"] for r in out}
    assert 10 in kept_ids           # judged on its cleaned body
    assert 11 not in kept_ids       # repetition filter sees past the banner
    # chunks of doc 10 come from the cleaned text only (no banner tokens)
    n_tok = {r["doc_id"]: r["n_tokens"] for r in out if r["doc_id"] == 10}
    assert sum(r["n_tokens"] for r in out if r["doc_id"] == 10) == len(
        good_body.split()
    ), n_tok


def test_curation_v3_full_hygiene_chain(spark):
    """End-to-end v3: the eval split is held out, a candidate copying an
    eval n-gram is decontaminated away, a Gopher-failing page drops, and a
    clean page survives to chunks — all on boilerplate-cleaned text."""
    from augmented_codebase_indexer_spark.plans.curation import curation_pipeline_v3

    banner = "subscribe to the newsletter and accept the cookies now please"
    base = ("the quick brown fox jumps over a lazy dog and then it runs to "
            "the old river bank where the other animals wait for it in the "
            "morning sun with a calm mood")
    rows = [(i, f"{banner}. filler padding row {i}") for i in range(1, 6)]
    rows.append((53, f"{banner}. {base} secret eval marker phrase here"))  # eval split
    rows.append((7, f"{banner}. {base} secret eval marker phrase here"))   # contaminated
    fresh = ("a small boat drifts down the wide green valley while birds "
             "sing in the tall trees and the warm wind moves over the "
             "quiet fields of corn near the farm")
    rows.append((8, f"{banner}. {fresh}"))                                 # clean → kept
    rows.append((9, f"{banner}. too short"))                               # Gopher words floor
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation_pipeline_v3(
        df, size=10, overlap=0, boiler_min_df=3, decontam_n=5,
        gopher=dict(min_words=20, min_stopwords=1, min_frac_alpha=0.5,
                    max_dup_2gram=0.6),
    ).collect()
    kept_ids = {r["doc_id"] for r in out}
    assert 8 in kept_ids
    assert 53 not in kept_ids  # eval split held out of training
    assert 7 not in kept_ids   # shares a 5-gram with the eval doc
    assert 9 not in kept_ids   # fails the word-count rule


def test_curation_funnel_consistent_with_v3(spark):
    """The funnel is the v3 chain's own counts: monotone non-increasing
    through the stages, and n_winners == distinct docs in the v3 output."""
    from augmented_codebase_indexer_spark.plans.curation import (
        curation_funnel,
        curation_pipeline_v3,
    )

    banner = "subscribe to the newsletter and accept the cookies now please"
    fresh = ("a small boat drifts down the wide green valley while birds "
             "sing in the tall trees and the warm wind moves over the "
             "quiet fields of corn near the farm")
    rows = [(i, f"{banner}. filler padding row {i}") for i in range(1, 6)]
    rows += [(53, f"{banner}. held out eval document with its own words"),
             (8, f"{banner}. {fresh}"), (9, f"{banner}. {fresh}")]  # 9 dups 8
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(boiler_min_df=3, decontam_n=5,
              gopher=dict(min_words=20, min_stopwords=1, min_frac_alpha=0.5,
                          max_dup_2gram=0.6))
    fun = curation_funnel(df, **kw).collect()[0]
    assert (fun["n_input"] >= fun["n_nonempty"] >= fun["n_candidates"]
            >= fun["n_gopher"] >= fun["n_decontaminated"] >= fun["n_lang"]
            >= fun["n_winners"])
    v3_docs = {
        r["doc_id"]
        for r in curation_pipeline_v3(df, size=10, overlap=0, **kw).collect()
    }
    assert fun["n_winners"] == len(v3_docs) == 1  # 8 wins, 9 deduped away


def test_curation_v4_drops_near_dups_v3_keeps(spark):
    """v4's cluster dedup removes NEAR-duplicates (one word changed →
    different sha, so v3's exact tier keeps both), keeping the min id."""
    from augmented_codebase_indexer_spark.plans.curation import (
        curation_pipeline_v3,
        curation_pipeline_v4,
    )

    base = ("the quick brown fox jumps over a lazy dog and then it runs to "
            "the old river bank where the other animals wait for it in the "
            "morning sun with a calm mood")
    near = base.replace("calm", "quiet")       # near-dup, different hash
    rows = [(8, base), (9, near),
            (10, "a small boat drifts down the wide green valley while birds "
                 "sing in the tall trees and the warm wind moves over the "
                 "quiet fields of corn near the farm")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(size=10, overlap=0, boiler_min_df=3, decontam_n=5, eval_mod=53,
              gopher=dict(min_words=20, min_stopwords=1, min_frac_alpha=0.5,
                          max_dup_2gram=0.6))
    v3_ids = {r["doc_id"] for r in curation_pipeline_v3(df, **kw).collect()}
    v4_ids = {r["doc_id"] for r in curation_pipeline_v4(
        df, near_threshold=0.5, **kw).collect()}
    assert v3_ids == {8, 9, 10}   # exact tier sees two different hashes
    assert v4_ids == {8, 10}      # cluster tier keeps the min id only


def test_curation_v5_drops_lm_tail_v4_keeps(spark):
    """v5's CCNet stage drops a doc that PASSES every v4 filter (enough
    words, stopwords, alphabetic, low repetition) but whose tokens are
    all OOV under the reference-slice LM — keyword-stuffing-style junk
    that rule-based filters cannot see. v4 keeps it; v5 drops it."""
    from augmented_codebase_indexer_spark.plans.curation import (
        curation_pipeline_v4,
        curation_pipeline_v5,
    )

    prose = ("the quick brown fox jumps over a lazy dog and then it runs to "
             "the old river bank where the other animals wait for it in the "
             "morning sun with a calm mood")
    prose2 = ("a small boat drifts down the wide green valley while birds "
              "sing in the tall trees and the warm wind moves over the "
              "quiet fields of corn near the farm")
    junk = ("the blorp zixy wub qorv menth trale oskit dravle pum yeft "
            "cruldo vemp askarn tilvo brase quint melgor sovand plik "
            "marzen dilf orkast pevin strule gamor hexit varn welpid "
            "costrun ablit fenor")  # ≥30 words, has 'the', all alpha
    # doc_ids chosen so 10 and 20 seed the LM (ref slice % 10 == 0) and
    # none hits the eval holdout (% 53)
    df = spark.createDataFrame(
        [(10, prose), (20, prose2), (21, junk)], "doc_id long, text string"
    )
    kw = dict(size=10, overlap=0, boiler_min_df=3, decontam_n=5, eval_mod=53,
              gopher=dict(min_words=20, min_stopwords=1, min_frac_alpha=0.5,
                          max_dup_2gram=0.6))
    v4_ids = {r["doc_id"] for r in curation_pipeline_v4(df, **kw).collect()}
    assert v4_ids == {10, 20, 21}  # rule filters can't see the junk
    # tail cut between the prose entropies (~3.3) and the all-OOV junk
    v5_ids = {r["doc_id"] for r in curation_pipeline_v5(
        df, lm_buckets=(3.0, 4.0), **kw).collect()}
    assert v5_ids == {10, 20}


def test_v6_trained_lid_catches_marker_false_positive(spark):
    """VERDICT r5 Next #4: a German doc stuffed with English MARKER
    tokens ('of the' borrowings) fools the marker heuristic (en markers
    6 > de markers 1 → predicted 'en', wrongly kept by v5); the trained
    char-n-gram LID sees German character statistics and drops it. Both
    modes keep the genuine English prose."""
    from augmented_codebase_indexer_spark.plans.curation import (
        curation_pipeline_v5,
    )

    en1 = ("the quick brown fox jumps over a lazy dog and then it runs to "
           "the old river bank where the other animals wait for it in the "
           "morning sun with a calm mood and the day goes on for a while")
    en2 = ("a small boat drifts down the wide green valley while birds "
           "sing in the tall trees and the warm wind moves over the "
           "quiet fields of corn near the farm and the water shines")
    de_trained = ("der schnelle braune fuchs springt ueber den faulen hund "
                  "und rennt dann zum alten flussufer wo die anderen tiere "
                  "morgens in der sonne auf ihn warten und der tag beginnt "
                  "ganz ruhig und die voegel singen in den hohen baeumen")
    # German content whose only marker hits are ENGLISH ones ('of the'
    # loan phrases); no der/die/und/das/mit tokens at all
    de_tricky = ("besuchen sie den shop of the zukunft heute denn dort "
                 "gibt es viele neue sachen of the woche zum ansehen "
                 "kaufen sparen bei jedem einkauf im laden of the stadt "
                 "immer offen taeglich gerne schnell guenstig freundlich")
    rows = [(10, en1, "en"), (20, en2, "en"), (30, de_trained, "de"),
            (21, de_tricky, "de")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kw = dict(size=10, overlap=0, boiler_min_df=3, decontam_n=5, eval_mod=53,
              lm_buckets=(0.5, 9.0),  # nothing lands in 'tail'
              gopher=dict(min_words=20, min_stopwords=1, min_frac_alpha=0.5,
                          max_dup_2gram=0.6))
    from augmented_codebase_indexer_spark.operators.textstats import lang_id_col
    import pyspark.sql.functions as F

    marker = {r["doc_id"]: r["p"] for r in df.select(
        "doc_id", lang_id_col(F.col("text")).alias("p")).collect()}
    assert marker[21] == "en"  # the heuristic is fooled
    v5_ids = {r["doc_id"] for r in curation_pipeline_v5(df, **kw).collect()}
    assert 21 in v5_ids  # marker mode wrongly keeps the German doc
    v6_ids = {r["doc_id"] for r in curation_pipeline_v5(
        df, lid="trained", lid_langs=["de", "en"], **kw).collect()}
    assert v6_ids == {10, 20}  # trained LID drops BOTH German docs


def test_repetition_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
