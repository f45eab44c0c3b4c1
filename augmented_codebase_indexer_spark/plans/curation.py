"""Training-data curation pipeline — the end-to-end "what a 100 TB corpus
pipeline actually runs nightly" composition of the training-data operators:

    documents
      → quality score + language ID          (operators/textstats, JVM exprs)
      → keep lang == allowed, quality ≥ floor
      → exact-dedup winners                   (min doc_id per content hash)
      → token-window chunks with overlap      (operators/chunking)
      → curated chunk rows (doc_id, chunk_id, part_index, n_tokens, quality)

Plan shape at scale: stats + filters are narrow JVM expressions fused into
the scan stage; the dedup winner needs ONE shuffle on the content hash
(uniform key — no skew); chunking is a narrow flatMap. Filters run BEFORE
the dedup shuffle so junk never pays shuffle IO. Every stage is
SQL-mirrorable — the driver's DuckDB oracle replays the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.chunking import chunk_documents, chunk_oracle_sql
from ..operators.textstats import (
    lang_id_col,
    quality_micro_col,
    quality_micro_sql,
)


def curate_documents(
    docs: DataFrame,
    min_quality: float = 0.3,
    allowed_langs: tuple = ("en",),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ surviving (doc_id, text, quality_micro): language + quality
    floor + exact-dup winner (min doc_id per sha256(text) —
    deterministic). quality_micro is the exact-BIGINT gated score
    (textstats.quality_micro_col — the float score has structural 6-dp
    rounding ties, 5/500 sf0.01 docs); the float ``min_quality`` floor is
    applied as an integer micro comparison."""
    min_q_micro = int(round(min_quality * 1_000_000))
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        quality_micro_col(F.col(text_col)).alias("quality_micro"),
        lang_id_col(F.col(text_col)).alias("lang_pred"),
    ).filter(
        (F.col("quality_micro") >= min_q_micro)
        & F.col("lang_pred").isin(*allowed_langs)
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy(F.asc("doc_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "text", "quality_micro")
    )


def curation_pipeline(
    docs: DataFrame,
    min_quality: float = 0.3,
    allowed_langs: tuple = ("en",),
    size: int = 40,
    overlap: int = 10,
) -> DataFrame:
    """→ curated chunk rows (doc_id, chunk_id, part_index, total_parts,
    n_tokens, quality) ready for the embedding stage."""
    kept = curate_documents(docs, min_quality, allowed_langs)
    chunks = chunk_documents(kept.select("doc_id", "text"), size=size, overlap=overlap)
    return chunks.join(kept.select("doc_id", "quality_micro"), "doc_id").select(
        "doc_id", "chunk_id", "part_index", "total_parts", "n_tokens",
        "quality_micro",
    )


def curation_pipeline_v2(
    docs: DataFrame,
    min_quality: float = 0.3,
    allowed_langs: tuple = ("en",),
    size: int = 40,
    overlap: int = 10,
    boiler_min_df: int = 3,
    max_dup_2gram: float = 0.3,
    seg_sep: str = ". ",
) -> DataFrame:
    """The full nightly pass with the corpus-level filters in front:

        documents → cross-doc boilerplate segment removal
                  → repetition filter (dup-2-gram fraction ≤ threshold)
                  → quality + language floor ON THE CLEANED TEXT
                  → exact-dedup winners → token chunks

    Boilerplate removal runs FIRST so a page that is 90% cookie banner is
    judged (and deduped) on its real content — scoring before cleaning
    would let boilerplate carry junk pages over the quality floor. Cost at
    scale: the two boilerplate shuffles + the one dedup shuffle; the
    repetition/quality/lang filters are narrow and fused."""
    from ..operators.curation_filters import boilerplate_prune, dup_2gram_frac_col

    cleaned = (
        boilerplate_prune(docs, min_df=boiler_min_df, seg_sep=seg_sep)
        .filter(F.length("clean_text") > 0)
        .filter(dup_2gram_frac_col(F.col("clean_text")) <= max_dup_2gram)
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    kept = curate_documents(cleaned, min_quality, allowed_langs)
    chunks = chunk_documents(kept.select("doc_id", "text"), size=size, overlap=overlap)
    return chunks.join(kept.select("doc_id", "quality_micro"), "doc_id").select(
        "doc_id", "chunk_id", "part_index", "total_parts", "n_tokens",
        "quality_micro",
    )


def curation_v2_oracle_sql(
    min_quality: float = 0.3,
    size: int = 40,
    overlap: int = 10,
    boiler_min_df: int = 3,
    max_dup_2gram: float = 0.3,
    table: str = "documents",
) -> str:
    """DuckDB mirror of ``curation_pipeline_v2`` — the boilerplate oracle
    feeds the v1 quality/dedup/chunk SQL as the source table."""
    from ..operators.curation_filters import boilerplate_oracle_sql

    boiler = boilerplate_oracle_sql(min_df=boiler_min_df, table=table)
    cleaned = f"""(
      SELECT doc_id, text FROM (
        SELECT doc_id, clean_text AS text,
               string_split(clean_text, ' ') AS toks,
               len(string_split(clean_text, ' ')) AS n
        FROM ({boiler}) WHERE length(clean_text) > 0)
      WHERE (CASE WHEN n >= 2 THEN
               floor((1.0 - CAST(len(list_distinct(
                  [toks[i] || ' ' || toks[i+1] FOR i IN range(1, n)]
               )) AS DOUBLE) / (n - 1)) * 1e6) / 1e6
             ELSE 0.0 END) <= {max_dup_2gram})"""
    return curation_oracle_sql(
        min_quality=min_quality, size=size, overlap=overlap, table=cleaned
    )


# Gopher thresholds tuned for the synthetic corpus (30-80-word docs, tiny
# vocab): word floor 30, ≥1 stopword, ≥50% alphabetic tokens, dup-2-gram
# ≤0.5. Web-scale runs use gopher_flag_cols' published defaults instead.
V3_GOPHER = dict(
    min_words=30, min_stopwords=1, min_frac_alpha=0.5, max_dup_2gram=0.5
)


def curation_pipeline_v3(
    docs: DataFrame,
    size: int = 40,
    overlap: int = 10,
    boiler_min_df: int = 3,
    decontam_n: int = 13,
    eval_mod: int = 53,
    allowed_langs: tuple = ("en",),
    gopher: dict | None = None,
) -> DataFrame:
    """The complete hygiene chain — every data-hygiene operator composed
    into one nightly pass:

        documents → cross-doc boilerplate removal
                  → PII redaction (typed placeholders)
                  → hold out the eval split (doc_id % eval_mod == 0)
                  → Gopher quality rules on the cleaned text
                  → benchmark decontamination vs the eval split's n-grams
                  → language floor → exact-dedup winners → token chunks

    Plan shape at scale: boilerplate costs its two segment-level shuffles
    (inherent to the global frequency pass — see curation_filters module
    note); every later stage before dedup is narrow — PII + Gopher +
    language fuse into one JVM filter stage, and decontamination
    broadcasts both the eval grams and the (small) contaminated id set —
    so the assembled document text crosses exactly ONE exchange after
    cleaning: the dedup-winner shuffle, paid only by docs that survived
    every filter."""
    from ..operators.curation_filters import boilerplate_prune
    from ..operators.decontam import decontaminate_filter
    from ..operators.guards import register_pin
    from ..operators.pii import redact_pii
    from ..operators.textstats import gopher_flag_cols

    gopher = V3_GOPHER if gopher is None else gopher
    cleaned = boilerplate_prune(docs, min_df=boiler_min_df).filter(
        F.length("clean_text") > 0
    )
    cleaned = redact_pii(cleaned, text_col="clean_text", out_col="text").select(
        "doc_id", "text"
    )
    # the cleaned corpus is read three times (eval split, candidates, and
    # the decontamination gram explode) — pin it so the boilerplate
    # shuffles run once. A production nightly run materializes this
    # intermediate to a warehouse table instead (sources/catalog.py).
    cleaned = register_pin(cleaned.persist())
    eval_docs = cleaned.filter(F.col("doc_id") % eval_mod == 0)
    cands = cleaned.filter(F.col("doc_id") % eval_mod != 0)
    gophered = cands.filter(gopher_flag_cols(F.col("text"), **gopher)["passes"])
    kept_docs = decontaminate_filter(gophered, eval_docs, n=decontam_n)
    kept = curate_documents(kept_docs, 0.0, allowed_langs)
    chunks = chunk_documents(kept.select("doc_id", "text"), size=size, overlap=overlap)
    return chunks.join(kept.select("doc_id", "quality_micro"), "doc_id").select(
        "doc_id", "chunk_id", "part_index", "total_parts", "n_tokens",
        "quality_micro",
    )


def curation_v3_oracle_sql(
    size: int = 40,
    overlap: int = 10,
    boiler_min_df: int = 3,
    decontam_n: int = 13,
    eval_mod: int = 53,
    gopher: dict | None = None,
    table: str = "documents",
) -> str:
    """DuckDB mirror of ``curation_pipeline_v3`` — each stage's oracle
    builder composed in the same order."""
    from ..operators.curation_filters import boilerplate_oracle_sql
    from ..operators.decontam import decontaminate_oracle_sql
    from ..operators.pii import redacted_text_expr
    from ..operators.textstats import gopher_passes_sql

    gopher = V3_GOPHER if gopher is None else gopher
    boiler = boilerplate_oracle_sql(min_df=boiler_min_df, table=table)
    cleaned = (
        f"(SELECT doc_id, {redacted_text_expr('clean_text')} AS text"
        f" FROM ({boiler}) WHERE length(clean_text) > 0)"
    )
    decontam = decontaminate_oracle_sql(
        n=decontam_n,
        eval_pred=f"doc_id % {eval_mod} = 0",
        cand_pred=f"doc_id % {eval_mod} <> 0",
        table=cleaned,
    )
    final = f"""(
      SELECT doc_id, text FROM {cleaned}
      WHERE doc_id % {eval_mod} <> 0
        AND {gopher_passes_sql('text', **gopher)}
        AND doc_id NOT IN (SELECT doc_id FROM ({decontam}) WHERE NOT kept))"""
    return curation_oracle_sql(min_quality=0.0, size=size, overlap=overlap, table=final)


# DuckDB expression mirroring quality_micro_col(text) — exact BIGINT
# (the old float QUALITY_SQL had structural 6-dp rounding ties)
QUALITY_SQL = quality_micro_sql("text")

# DuckDB predicate mirroring lang_id_col(text) == 'en' ('en' is the first
# marker language, so it wins every tie it participates in)
LANG_EN_SQL = r"""
      len(regexp_extract_all(text, '\b(the|and|of|with|for)\b')) > 0
      AND len(regexp_extract_all(text, '\b(the|and|of|with|for)\b')) = greatest(
        len(regexp_extract_all(text, '\b(the|and|of|with|for)\b')),
        len(regexp_extract_all(text, '\b(der|die|und|das|mit)\b')),
        len(regexp_extract_all(text, '\b(le|la|et|les|des)\b')),
        len(regexp_extract_all(text, '\b(el|los|las|y|con)\b')))
    """


def curation_funnel(
    docs: DataFrame,
    boiler_min_df: int = 3,
    decontam_n: int = 13,
    eval_mod: int = 53,
    gopher: dict | None = None,
) -> DataFrame:
    """Observability for the v3 chain — the filter funnel as one row:
    how many docs enter, survive boilerplate cleaning, remain after the
    eval holdout, pass the Gopher rules, survive decontamination, pass the
    language floor, and how many distinct texts the dedup winner keeps.
    Every count a nightly run should alert on; none of the chain's drops
    are silent. Cost: the same stages as the pipeline, but terminating in
    two single-row aggregations (crossJoined) instead of chunk output."""
    from ..operators.curation_filters import boilerplate_prune
    from ..operators.decontam import contaminated_ids
    from ..operators.guards import guarded_broadcast, register_pin
    from ..operators.pii import redact_pii
    from ..operators.textstats import gopher_flag_cols, lang_id_col

    gopher = V3_GOPHER if gopher is None else gopher
    cleaned_all = redact_pii(
        boilerplate_prune(docs, min_df=boiler_min_df),
        text_col="clean_text", out_col="text",
    ).select("doc_id", "text")
    ne = register_pin(cleaned_all.filter(F.length("text") > 0).persist())
    eval_docs = ne.filter(F.col("doc_id") % eval_mod == 0)
    cands = ne.filter(F.col("doc_id") % eval_mod != 0)
    contam = contaminated_ids(cands, eval_docs, n=decontam_n).withColumn(
        "is_contam", F.lit(True)
    )
    flags = (
        cands.withColumn("g_pass", gopher_flag_cols(F.col("text"), **gopher)["passes"])
        .withColumn("is_en", lang_id_col(F.col("text")) == "en")
        .join(guarded_broadcast(contam), "doc_id", "left")
        .withColumn("clean", F.coalesce("is_contam", F.lit(False)) == False)  # noqa: E712
    )
    base = cleaned_all.agg(
        F.count(F.lit(1)).cast("long").alias("n_input"),
        F.sum((F.length("text") > 0).cast("long")).cast("long").alias("n_nonempty"),
    )
    final_pred = F.col("g_pass") & F.col("clean") & F.col("is_en")
    stages = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(F.col("g_pass").cast("long")).cast("long").alias("n_gopher"),
        F.sum((F.col("g_pass") & F.col("clean")).cast("long")).cast("long")
        .alias("n_decontaminated"),
        F.sum(final_pred.cast("long")).cast("long").alias("n_lang"),
        F.count_distinct(F.when(final_pred, F.sha2(F.col("text"), 256)))
        .cast("long").alias("n_winners"),
    )
    return base.crossJoin(stages)


def curation_funnel_oracle_sql(
    boiler_min_df: int = 3,
    decontam_n: int = 13,
    eval_mod: int = 53,
    gopher: dict | None = None,
    table: str = "documents",
) -> str:
    """DuckDB mirror of ``curation_funnel``."""
    from ..operators.curation_filters import boilerplate_oracle_sql
    from ..operators.decontam import decontaminate_oracle_sql
    from ..operators.pii import redacted_text_expr
    from ..operators.textstats import gopher_passes_sql

    gopher = V3_GOPHER if gopher is None else gopher
    boiler = boilerplate_oracle_sql(min_df=boiler_min_df, table=table)
    cleaned = (
        f"(SELECT doc_id, {redacted_text_expr('clean_text')} AS text"
        f" FROM ({boiler}))"
    )
    decontam = decontaminate_oracle_sql(
        n=decontam_n,
        eval_pred=f"doc_id % {eval_mod} = 0",
        cand_pred=f"doc_id % {eval_mod} <> 0",
        table=f"(SELECT doc_id, text FROM {cleaned} WHERE length(text) > 0)",
    )
    passes = gopher_passes_sql("text", **gopher)
    return f"""
    WITH cleaned AS (SELECT * FROM {cleaned}),
    ne AS (SELECT * FROM cleaned WHERE length(text) > 0),
    verdicts AS (SELECT doc_id, kept FROM ({decontam})),
    flags AS (
      SELECT ne.doc_id, ne.text, {passes} AS g_pass, v.kept AS clean,
             ({LANG_EN_SQL}) AS is_en
      FROM ne JOIN verdicts v USING (doc_id)
      WHERE ne.doc_id % {eval_mod} <> 0)
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM cleaned) AS n_input,
      (SELECT CAST(count(*) AS BIGINT) FROM ne) AS n_nonempty,
      CAST(count(*) AS BIGINT) AS n_candidates,
      CAST(count(*) FILTER (g_pass) AS BIGINT) AS n_gopher,
      CAST(count(*) FILTER (g_pass AND clean) AS BIGINT) AS n_decontaminated,
      CAST(count(*) FILTER (g_pass AND clean AND is_en) AS BIGINT) AS n_lang,
      CAST(count(DISTINCT CASE WHEN g_pass AND clean AND is_en
                 THEN sha256(text) END) AS BIGINT) AS n_winners
    FROM flags
    """


def curation_pipeline_v4(
    docs: DataFrame,
    size: int = 40,
    overlap: int = 10,
    boiler_min_df: int = 3,
    decontam_n: int = 13,
    eval_mod: int = 53,
    allowed_langs: tuple = ("en",),
    gopher: dict | None = None,
    near_threshold: float = 0.5,
    near_max_bucket: int = 200,
    broadcast_max_rows: int | None = None,
) -> DataFrame:
    """v3 with cluster-level NEAR-dedup in place of the exact-hash winner:
    after the hygiene filters, MinHash-LSH pairs close into connected
    components and only the min-id member of each cluster is chunked —
    identical docs land in the same cluster (estimated Jaccard 1), so the
    exact tier is subsumed. The loser set is bounded by the number of
    near-dups — small on a clean corpus but 20-50% of the corpus at
    published web dup rates — so dropping it broadcasts only under the
    counted guard (``operators/guards.py``; ``None`` = module default)
    and otherwise degrades to a shuffled anti-join of slim ids; the
    corpus-wide exact-dedup shuffle of v3 is replaced by the
    signature-only band exchanges of the LSH join (no document text in
    any exchange)."""
    from ..operators.curation_filters import boilerplate_prune
    from ..operators.decontam import decontaminate_filter
    from ..operators.dedup import near_dup_losers
    from ..operators.guards import DEFAULT_BROADCAST_MAX_ROWS, guarded_broadcast, register_pin
    from ..operators.pii import redact_pii
    from ..operators.textstats import gopher_flag_cols, lang_id_col

    if broadcast_max_rows is None:
        broadcast_max_rows = DEFAULT_BROADCAST_MAX_ROWS

    gopher = V3_GOPHER if gopher is None else gopher
    cleaned = boilerplate_prune(docs, min_df=boiler_min_df).filter(
        F.length("clean_text") > 0
    )
    cleaned = redact_pii(cleaned, text_col="clean_text", out_col="text").select(
        "doc_id", "text"
    ).persist()
    register_pin(cleaned)
    eval_docs = cleaned.filter(F.col("doc_id") % eval_mod == 0)
    cands = cleaned.filter(F.col("doc_id") % eval_mod != 0)
    gophered = cands.filter(gopher_flag_cols(F.col("text"), **gopher)["passes"])
    eligible = (
        decontaminate_filter(gophered, eval_docs, n=decontam_n,
                             broadcast_max_rows=broadcast_max_rows)
        .filter(lang_id_col(F.col("text")).isin(*allowed_langs))
        .withColumn("quality_micro", quality_micro_col(F.col("text")))
        .persist()
    )
    register_pin(eligible)
    losers = near_dup_losers(
        eligible, threshold=near_threshold, max_bucket_size=near_max_bucket
    )
    kept = eligible.join(guarded_broadcast(losers, broadcast_max_rows),
                         "doc_id", "left_anti")
    chunks = chunk_documents(kept.select("doc_id", "text"), size=size, overlap=overlap)
    return chunks.join(kept.select("doc_id", "quality_micro"), "doc_id").select(
        "doc_id", "chunk_id", "part_index", "total_parts", "n_tokens",
        "quality_micro",
    )


def curation_v4_oracle_sql(
    size: int = 40,
    overlap: int = 10,
    boiler_min_df: int = 3,
    decontam_n: int = 13,
    eval_mod: int = 53,
    gopher: dict | None = None,
    near_threshold: float = 0.5,
    near_max_bucket: int = 200,
    table: str = "documents",
) -> str:
    """DuckDB mirror of ``curation_pipeline_v4`` — the hygiene subquery of
    v3 feeds the minhash pair SQL, closed by a recursive CTE; winners =
    docs that are their own component label."""
    from ..operators.curation_filters import boilerplate_oracle_sql
    from ..operators.decontam import decontaminate_oracle_sql
    from ..operators.pii import redacted_text_expr
    from ..operators.textstats import gopher_passes_sql
    from ..operators.dedup import minhash_oracle_sql

    gopher = V3_GOPHER if gopher is None else gopher
    boiler = boilerplate_oracle_sql(min_df=boiler_min_df, table=table)
    cleaned = (
        f"(SELECT doc_id, {redacted_text_expr('clean_text')} AS text"
        f" FROM ({boiler}) WHERE length(clean_text) > 0)"
    )
    decontam = decontaminate_oracle_sql(
        n=decontam_n,
        eval_pred=f"doc_id % {eval_mod} = 0",
        cand_pred=f"doc_id % {eval_mod} <> 0",
        table=cleaned,
    )
    pairs = minhash_oracle_sql(
        threshold=near_threshold, max_bucket_size=near_max_bucket,
        table="eligible",
    )
    chunks = chunk_oracle_sql(size=size, overlap=overlap, table="kept")
    # MATERIALIZED is load-bearing (the k_core oracle lesson): DuckDB
    # inlines plain CTEs at every reference, and `eligible` sits under
    # the RECURSIVE connected-components iteration — unmaterialized, the
    # whole filter pipeline re-executes every CC round (v6's trained-LID
    # clause pushed that from slow to unbounded-looking)
    return f"""
    WITH RECURSIVE eligible AS MATERIALIZED (
      SELECT doc_id, text, {QUALITY_SQL} AS quality_micro FROM {cleaned}
      WHERE doc_id % {eval_mod} <> 0
        AND {gopher_passes_sql('text', **gopher)}
        AND doc_id NOT IN (SELECT doc_id FROM ({decontam}) WHERE NOT kept)
        AND ({LANG_EN_SQL})),
    np AS MATERIALIZED (SELECT ida, idb FROM ({pairs})),
    nedges AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM np
               UNION SELECT idb, ida FROM np),
    ncc AS (
      SELECT src AS id, src AS label FROM nedges
      UNION
      SELECT e.dst AS id, c.label FROM ncc c JOIN nedges e ON e.src = c.id
    ),
    ncomp AS (SELECT id, min(label) AS component FROM ncc GROUP BY id),
    kept AS MATERIALIZED (
      SELECT e.doc_id, e.text, e.quality_micro FROM eligible e
      LEFT JOIN ncomp c ON c.id = e.doc_id
      WHERE coalesce(c.component, e.doc_id) = e.doc_id),
    chunks AS ({chunks})
    SELECT c.doc_id, c.chunk_id, c.part_index, c.total_parts, c.n_tokens,
           k.quality_micro
    FROM chunks c JOIN kept k USING (doc_id)
    """


def curation_pipeline_v5(
    docs: DataFrame,
    size: int = 40,
    overlap: int = 10,
    boiler_min_df: int = 3,
    decontam_n: int = 13,
    eval_mod: int = 53,
    allowed_langs: tuple = ("en",),
    gopher: dict | None = None,
    near_threshold: float = 0.5,
    near_max_bucket: int = 200,
    lm_ref_mod: int = 10,
    lm_buckets: tuple = (3.40, 3.43),
    broadcast_max_rows: int | None = None,
    lid: str = "marker",
    lid_langs: list[str] | None = None,
    lid_n: int = 2,
) -> DataFrame:
    """v4 plus the CCNet stage: an add-one unigram LM trained on the
    cleaned corpus' ``doc_id % lm_ref_mod == 0`` reference slice scores
    every cleaned doc, and candidates whose cross-entropy lands in the
    'tail' bucket are dropped before dedup (CCNet keeps head, samples
    middle, drops tail — we implement the deterministic keep/drop form).

    ``lid`` selects the language gate (VERDICT r5 Next #4 — this
    completes the CCNet LID → LM → filter chain end-to-end):

    * ``'marker'`` (default) — the zero-cost marker-word heuristic
      (``textstats.lang_id_col``), a narrow codegen expression.
    * ``'trained'`` — the char-n-gram LID (``operators/langid``) trained
      on ``docs``' own ``lang`` labels (``lid_langs`` pins the label
      set; None collects the distinct labels — bounded by real language
      codes), scoring the CLEANED text. Docs whose prediction is not in
      ``allowed_langs`` — or that are too short to carry an n-gram —
      are dropped. The keep-set can be ~90% of the corpus, so it joins
      back doc_id-keyed (slim rows), never broadcast.

    Scale: the LM keep-set is 75-90% of the corpus — NEVER broadcast; it
    joins back as a doc_id-keyed inner join of slim (doc_id) rows
    co-keyed with the rest of the chain. The tail set is dropped by NOT
    being in the keep-set, so no anti-join of a big side exists either.
    """
    from ..operators.curation_filters import boilerplate_prune
    from ..operators.decontam import decontaminate_filter
    from ..operators.dedup import near_dup_losers
    from ..operators.guards import DEFAULT_BROADCAST_MAX_ROWS, guarded_broadcast, register_pin
    from ..operators.lmquality import lm_cross_entropy
    from ..operators.pii import redact_pii
    from ..operators.textstats import gopher_flag_cols, lang_id_col

    if broadcast_max_rows is None:
        broadcast_max_rows = DEFAULT_BROADCAST_MAX_ROWS

    gopher = V3_GOPHER if gopher is None else gopher
    cleaned = boilerplate_prune(docs, min_df=boiler_min_df).filter(
        F.length("clean_text") > 0
    )
    cleaned = redact_pii(cleaned, text_col="clean_text", out_col="text").select(
        "doc_id", "text"
    ).persist()
    register_pin(cleaned)
    # CCNet stage: score the whole cleaned corpus under the reference-slice
    # LM; survivors = docs outside the tail bucket
    lm_keep = (
        lm_cross_entropy(
            cleaned,
            cleaned.filter(F.col("doc_id") % lm_ref_mod == 0),
            buckets=lm_buckets,
        )
        .filter(F.col("ppl_bucket") != "tail")
        .select("doc_id")
    )
    eval_docs = cleaned.filter(F.col("doc_id") % eval_mod == 0)
    cands = cleaned.filter(F.col("doc_id") % eval_mod != 0).join(lm_keep, "doc_id")
    gophered = cands.filter(gopher_flag_cols(F.col("text"), **gopher)["passes"])
    decontammed = decontaminate_filter(
        gophered, eval_docs, n=decontam_n, broadcast_max_rows=broadcast_max_rows
    )
    if lid == "trained":
        from ..operators.langid import lang_id_ngram

        lid_keep = (
            lang_id_ngram(
                cleaned.select("doc_id", "text"), train_docs=docs,
                langs=lid_langs, n=lid_n,
                broadcast_max_rows=broadcast_max_rows,
            )
            .filter(F.col("lang_pred").isin(*allowed_langs))
            .select("doc_id")
        )
        lang_gated = decontammed.join(lid_keep, "doc_id")
    else:
        lang_gated = decontammed.filter(
            lang_id_col(F.col("text")).isin(*allowed_langs)
        )
    eligible = (
        lang_gated
        .withColumn("quality_micro", quality_micro_col(F.col("text")))
        .persist()
    )
    register_pin(eligible)
    losers = near_dup_losers(
        eligible, threshold=near_threshold, max_bucket_size=near_max_bucket
    )
    kept = eligible.join(guarded_broadcast(losers, broadcast_max_rows),
                         "doc_id", "left_anti")
    chunks = chunk_documents(kept.select("doc_id", "text"), size=size, overlap=overlap)
    return chunks.join(kept.select("doc_id", "quality_micro"), "doc_id").select(
        "doc_id", "chunk_id", "part_index", "total_parts", "n_tokens",
        "quality_micro",
    )


def curation_v5_oracle_sql(
    size: int = 40,
    overlap: int = 10,
    boiler_min_df: int = 3,
    decontam_n: int = 13,
    eval_mod: int = 53,
    gopher: dict | None = None,
    near_threshold: float = 0.5,
    near_max_bucket: int = 200,
    lm_ref_mod: int = 10,
    lm_buckets: tuple = (3.40, 3.43),
    table: str = "documents",
    lid: str = "marker",
    lid_langs: list[str] | None = None,
    lid_n: int = 2,
) -> str:
    """DuckDB mirror of ``curation_pipeline_v5`` — the v4 mirror with the
    LM keep-set membership folded into the eligible CTE; with
    ``lid='trained'`` the marker clause becomes membership in the
    char-n-gram LID result (trained on ``table``'s labels, scoring the
    cleaned text — the same shape as the Spark chain)."""
    from ..operators.curation_filters import boilerplate_oracle_sql
    from ..operators.decontam import decontaminate_oracle_sql
    from ..operators.dedup import minhash_oracle_sql
    from ..operators.lmquality import lm_quality_oracle_sql
    from ..operators.pii import redacted_text_expr
    from ..operators.textstats import gopher_passes_sql

    gopher = V3_GOPHER if gopher is None else gopher
    boiler = boilerplate_oracle_sql(min_df=boiler_min_df, table=table)
    cleaned = (
        f"(SELECT doc_id, {redacted_text_expr('clean_text')} AS text"
        f" FROM ({boiler}) WHERE length(clean_text) > 0)"
    )
    lm = lm_quality_oracle_sql(
        ref_pred=f"doc_id % {lm_ref_mod} = 0", buckets=lm_buckets, table=cleaned
    )
    decontam = decontaminate_oracle_sql(
        n=decontam_n,
        eval_pred=f"doc_id % {eval_mod} = 0",
        cand_pred=f"doc_id % {eval_mod} <> 0",
        table=cleaned,
    )
    pairs = minhash_oracle_sql(
        threshold=near_threshold, max_bucket_size=near_max_bucket,
        table="eligible",
    )
    chunks = chunk_oracle_sql(size=size, overlap=overlap, table="kept")
    if lid == "trained":
        from ..operators.langid import lang_id_oracle_sql

        lid_sql = lang_id_oracle_sql(
            lid_langs, n=lid_n, table=table, score_table=cleaned
        )
        lang_clause = (
            f"doc_id IN (SELECT doc_id FROM ({lid_sql}) "
            f"WHERE lang_pred = 'en')"
        )
    else:
        lang_clause = LANG_EN_SQL
    return f"""
    WITH RECURSIVE eligible AS MATERIALIZED (
      SELECT doc_id, text, {QUALITY_SQL} AS quality_micro FROM {cleaned}
      WHERE doc_id % {eval_mod} <> 0
        AND doc_id IN (SELECT doc_id FROM ({lm}) WHERE ppl_bucket <> 'tail')
        AND {gopher_passes_sql('text', **gopher)}
        AND doc_id NOT IN (SELECT doc_id FROM ({decontam}) WHERE NOT kept)
        AND ({lang_clause})),
    np AS MATERIALIZED (SELECT ida, idb FROM ({pairs})),
    nedges AS MATERIALIZED (SELECT ida AS src, idb AS dst FROM np
               UNION SELECT idb, ida FROM np),
    ncc AS (
      SELECT src AS id, src AS label FROM nedges
      UNION
      SELECT e.dst AS id, c.label FROM ncc c JOIN nedges e ON e.src = c.id
    ),
    ncomp AS (SELECT id, min(label) AS component FROM ncc GROUP BY id),
    kept AS MATERIALIZED (
      SELECT e.doc_id, e.text, e.quality_micro FROM eligible e
      LEFT JOIN ncomp c ON c.id = e.doc_id
      WHERE coalesce(c.component, e.doc_id) = e.doc_id),
    chunks AS ({chunks})
    SELECT c.doc_id, c.chunk_id, c.part_index, c.total_parts, c.n_tokens,
           k.quality_micro
    FROM chunks c JOIN kept k USING (doc_id)
    """


def curation_oracle_sql(
    min_quality: float = 0.3,
    size: int = 40,
    overlap: int = 10,
    table: str = "documents",
) -> str:
    """DuckDB mirror of ``curation_pipeline`` (en-only)."""
    quality = QUALITY_SQL
    min_q_micro = int(round(min_quality * 1_000_000))
    lang_en = LANG_EN_SQL
    chunks = chunk_oracle_sql(size=size, overlap=overlap, table="kept")
    return f"""
    WITH scored AS (
      SELECT doc_id, text, {quality} AS quality_micro
      FROM {table}
      WHERE {quality} >= {min_q_micro} AND ({lang_en})),
    kept AS (
      SELECT doc_id, text, quality_micro FROM (
        SELECT *, row_number() OVER (PARTITION BY sha256(text)
                                     ORDER BY doc_id ASC) AS rn
        FROM scored) WHERE rn = 1),
    chunks AS ({chunks})
    SELECT c.doc_id, c.chunk_id, c.part_index, c.total_parts, c.n_tokens,
           k.quality_micro
    FROM chunks c JOIN kept k USING (doc_id)
    """
