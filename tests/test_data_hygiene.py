"""Training-data hygiene operators: benchmark decontamination, Gopher-style
quality rules, PII redaction — planted-case gates (the driver oracle gates
the same ops statistically at sf0.01)."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.decontam import decontaminate
from augmented_codebase_indexer_spark.operators.pii import redact_pii
from augmented_codebase_indexer_spark.operators.textstats import gopher_quality_flags


def test_decontaminate_flags_planted_overlap(spark):
    eval_docs = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [
            # copies an eval 5-gram verbatim → contaminated
            (1, "some page saying the secret benchmark answer is known"),
            # shares words but no 5-gram → clean
            (2, "benchmark the answer secret is two forty page words"),
            (3, "completely unrelated text about rivers and mountains"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(cands, eval_docs, n=5).collect()}
    assert not out[1]["kept"] and out[1]["n_hits"] >= 1
    assert out[2]["kept"] and out[2]["n_hits"] == 0
    assert out[3]["kept"]


def test_decontaminate_no_text_in_shuffle(spark):
    """Corpus text must not cross an exchange: only (doc_id, gram_h) rows
    that HIT the broadcast eval set reach the aggregation."""
    eval_docs = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    cands = spark.createDataFrame([(1, "x y z w v u")], "doc_id long, text string")
    plan = (
        decontaminate(cands, eval_docs, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "text" not in m.group(0), m.group(0)
    assert "BroadcastExchange" in plan  # eval grams + hits both broadcast


def test_decontaminate_spans_excises_only_the_leak(spark):
    from augmented_codebase_indexer_spark.operators.decontam import decontaminate_spans

    eval_docs = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [
            (1, "good prose before the secret benchmark answer is forty two and good prose after"),
            (2, "totally clean document with no leaked content at all"),
            (3, "short doc"),  # shorter than n → no window, passes through
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           decontaminate_spans(cands, eval_docs, n=5).collect()}
    # every 5-gram window inside the quoted phrase hits, so the whole
    # quote (plus any token covered by a hitting window) is excised;
    # tokens outside every hitting window survive
    assert "secret" not in out[1]["clean_text"]
    assert "forty" not in out[1]["clean_text"]
    assert out[1]["clean_text"].startswith("good prose")
    assert out[1]["clean_text"].endswith("good prose after")
    assert out[1]["n_hit_spans"] >= 1 and out[1]["n_tokens_removed"] >= 7
    assert out[2]["clean_text"] == cands.collect()[1]["text"]
    assert out[2]["n_tokens_removed"] == 0 and out[2]["n_hit_spans"] == 0
    assert out[3]["clean_text"] == "short doc"


def test_gopher_rules_each_flag_fires(spark):
    good = "the quick brown fox jumps over a lazy dog and then it runs to the old river bank where the other animals wait for it in the morning sun with a calm and happy mood all day long every single week of the year is it not a fine tale to tell"
    rows = [
        (1, good),                                     # passes everything
        (2, "short text only"),                        # word count floor
        (3, " ".join(["internationalization"] * 60)),  # mean len + repetition
        (4, " ".join(f"w{i}" for i in range(60))),     # no stopwords, mean len < 3
        (5, " ".join(str(i) for i in range(100, 160))),  # numeric → frac_alpha
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert out[1]["passes"], dict(out[1].asDict())
    assert not out[2]["flag_words"] and not out[2]["passes"]
    assert not out[3]["flag_mean_len"] and not out[3]["flag_repetition"]
    assert not out[4]["flag_stopwords"]
    assert not out[5]["flag_alpha"] and not out[5]["passes"]


def test_gopher_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = gopher_quality_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_near_dedup_winners_cluster_keep_one(spark):
    from augmented_codebase_indexer_spark.operators.dedup import near_dedup_winners

    a = "the quick brown fox jumps over the lazy dog near the river bank today " * 3
    b = "a completely different story about ships and storms on the open sea " * 3
    rows = [(5, a), (1, a), (9, a),        # cluster A → winner 1
            (7, b), (2, b),                # cluster B → winner 2
            (3, "unique content that matches nothing else in this corpus")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in near_dedup_winners(df, threshold=0.5).collect()}
    assert len(out) == 6                      # every doc gets a verdict
    assert {d for d, r in out.items() if r["is_winner"]} == {1, 2, 3}
    assert out[5]["cluster_id"] == out[9]["cluster_id"] == out[1]["cluster_id"] == 1
    assert out[7]["cluster_id"] == out[2]["cluster_id"] == 2
    assert out[3]["cluster_id"] == 3 and out[3]["is_winner"]


def test_redact_pii_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.org or bob@ex.io thanks"),
            (2, "server 10.0.255.7 and 192.168.1.1 call 555-123-4567"),
            (3, "no pii here just words and numbers 12345"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 2 and out[1]["clean_text"] == (
        "mail me at <EMAIL> or <EMAIL> thanks"
    )
    assert out[2]["n_ipv4"] == 2 and out[2]["n_phone"] == 1
    assert out[2]["clean_text"] == "server <IP> and <IP> call <PHONE>"
    assert out[3]["clean_text"] == out[3]["text"]
    assert out[3]["n_email"] == out[3]["n_ipv4"] == out[3]["n_phone"] == 0


def test_contamination_report_counts_leaks_per_eval_doc(spark):
    """Planted: eval doc 100 leaked into two corpus docs, eval doc 200
    into none — the report keys by EVAL doc with zeros included."""
    from augmented_codebase_indexer_spark.operators.decontam import (
        contamination_report,
    )

    leak = "the secret benchmark answer is forty two exactly"
    rows = [
        (1, f"some page quoting {leak} verbatim in the middle of text"),
        (2, f"another mirror with {leak} pasted at the end"),
        (3, "a clean page about rivers and valleys with no quoted text"),
    ]
    cands = spark.createDataFrame(rows, "doc_id long, text string")
    evals = spark.createDataFrame(
        [(100, leak), (200, "an unleaked question nobody ever copied here")],
        "doc_id long, text string",
    )
    out = {r["eval_id"]: r for r in
           contamination_report(cands, evals, n=5).collect()}
    assert set(out) == {100, 200}
    assert out[100]["n_contaminated_docs"] == 2
    assert out[100]["n_leaked_grams"] == 4  # 8 tokens → four 5-gram windows
    assert out[200]["n_contaminated_docs"] == 0
    assert out[200]["n_leaked_grams"] == 0


def test_redact_pii_mixed_case_email(spark):
    """ADVICE r3: mixed-case emails must not slip through a privacy pass —
    Spark AND the DuckDB oracle replay the same both-case rule."""
    import duckdb

    from augmented_codebase_indexer_spark.operators.pii import redacted_text_expr

    text = "Contact John.Doe@Example.COM or ADMIN@SUB.Example.org now"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = redact_pii(df).collect()[0]
    assert row["n_email"] == 2
    assert row["clean_text"] == "Contact <EMAIL> or <EMAIL> now"
    ora = duckdb.sql(
        f"SELECT {redacted_text_expr(repr(text))} AS t"
    ).fetchone()[0]
    assert ora == row["clean_text"]
