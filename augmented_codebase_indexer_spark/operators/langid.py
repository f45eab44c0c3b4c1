"""Content-based language identification: per-language char-n-gram LMs
trained relationally on labeled slices, argmax by exact integer micro-nat
scores (VERDICT r4 Next #4 — completes the CCNet chain whose LM-quality
stage is ``operators/lmquality.py``; the reference's analog is language
detect from file extension, ``core/file_scanner/scanner.py:27-39`` +
``core/languages.yaml`` — i.e. it DETECTS rather than trusting an
upstream column. CCNet's LID stage is fastText (Wenzek et al. 2020,
public); hermetically we train the same-shape model relationally).

Model: one add-one-smoothed char-n-gram unigram LM per language over a
SHARED gram vocabulary (V = distinct grams across all training slices,
so per-language scores are comparable):

    lp(g | lang) = ln((c_{lang,g} + 1) / (T_lang + V + 1))

quantized ONCE per (lang, gram) to integer micro-nats (the repo's
cross-engine exactness discipline, ``lmquality.py``): every per-document
score is then a BIGINT sum — exact, order-independent, byte-identical
between Spark and the DuckDB oracle. The argmax is over exact integers
with ties broken by language code ascending — NO float crosses the
engine boundary anywhere.

Scale shape at 10^12 docs (same as lmquality): training is one
gram-keyed shuffle over the (much smaller / sampled) labeled slice; the
wide vocab (gram → one lp column per language) is a guarded broadcast
bounded by ``max_vocab_rows``; scoring explodes each doc's grams
map-side and partially aggregates BEFORE the exchange, so exactly one
combined row per (doc) crosses the wire. No text is shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.intlog import duckdb_ln_micro_sql, with_ln_micro
from .guards import guarded_broadcast, register_pin

_MICRO = 1_000_000


def _grams_expr(text_col: str, n: int) -> str:
    """Spark SQL: array of all char n-grams of ``text_col`` (empty when
    the text is shorter than n — guards sequence()'s descending-range
    surprise for start > stop)."""
    return (
        f"CASE WHEN length({text_col}) >= {n} THEN "
        f"transform(sequence(1, length({text_col}) - {n - 1}), "
        f"i -> substring({text_col}, i, {n})) "
        f"ELSE array() END"
    )


def _grams_sql(text_col: str, n: int) -> str:
    """DuckDB mirror of ``_grams_expr`` (range(a, b) is empty for
    a >= b, so no CASE needed — same result)."""
    return (
        f"[substring({text_col}, i, {n}) "
        f"FOR i IN range(1, length({text_col}) - {n - 2})]"
    )


def gram_frame(docs: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """→ (doc_id, gram): one row per char n-gram occurrence.

    r7: explode integer POSITIONS and slice the gram in a codegen
    projection, instead of materializing the per-doc array of gram
    strings through an interpreted ``transform`` lambda (that array
    build was the measured wall of both LID passes — 4.3 s of the 4.7 s
    lang_id cell at sf0.1). Same (doc_id, gram) multiset: positions
    1..len−n+1 with character-based ``substring``, docs shorter than
    ``n`` emit nothing."""
    return (
        docs.select("doc_id", text_col)
        .filter(F.length(text_col) >= n)
        .select(
            "doc_id",
            F.col(text_col),
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - F.lit(n - 1))
            ).alias("__i"),
        )
        .select(
            "doc_id",
            F.expr(f"substring({text_col}, __i, {n})").alias("gram"),
        )
    )


def train_char_lm(
    labeled: DataFrame,
    langs: list[str],
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 2,
    max_vocab_rows: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train per-language char-n-gram LMs on ``labeled`` docs.

    Returns (vocab, oov): ``vocab`` is WIDE — one row per gram with an
    integer micro-nat column ``lp_<lang>`` per language (null where that
    language never saw the gram → scorer coalesces to its OOV value);
    ``oov`` is ONE row with ``oov_<lang>`` columns. Add-one smoothing
    over the SHARED vocabulary makes a zero count and an unseen gram
    score identically: ln(1/(T_lang+V+1)).

    ``max_vocab_rows`` prunes to the globally most-frequent grams
    (count desc, gram asc — planned as sort+limit, not an unpartitioned
    window); pruned grams fall back to OOV on BOTH engines.
    """
    # r7: position-explode + codegen slice (see gram_frame) for the
    # training pass too — the label filter runs before the explode
    grams = (
        labeled.select(F.col(label_col).alias("lang"), F.col(text_col))
        .filter(F.col("lang").isin(*langs) & (F.length(text_col) >= n))
        .select(
            "lang",
            F.col(text_col),
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - F.lit(n - 1))
            ).alias("__i"),
        )
        .select("lang", F.expr(f"substring({text_col}, __i, {n})").alias("gram"))
    )
    counts = register_pin(
        grams.groupBy("lang", "gram").agg(F.count("*").cast("long").alias("c")).persist()
    )
    if max_vocab_rows is not None:
        keep = (
            counts.groupBy("gram")
            .agg(F.sum("c").alias("tc"))
            .orderBy(F.desc("tc"), F.asc("gram"))
            .limit(max_vocab_rows)
            .select("gram")
        )
        counts = counts.join(F.broadcast(keep), "gram")
        counts = register_pin(counts.persist())
    # V = |shared vocab| (post-prune), T_lang = tokens per language.
    # Both are single-row-per-lang aggregates — crossJoin'd, never collected.
    v_frame = counts.select("gram").distinct().agg(
        F.count("*").cast("long").alias("V")
    )
    totals = (
        counts.groupBy("lang")
        .agg(F.sum("c").cast("long").alias("T"))
        .crossJoin(F.broadcast(v_frame))
    )
    lp = with_ln_micro(
        counts.join(totals, "lang"), "c + 1", "T + V + 1", "lp_micro"
    ).select("gram", "lang", "lp_micro")
    vocab = lp.groupBy("gram").pivot("lang", langs).agg(F.first("lp_micro"))
    vocab = vocab.select(
        "gram", *[F.col(lg).alias(f"lp_{lg}") for lg in langs]
    )
    # cut lineage at the trained model (r6, the lmquality precedent):
    # the intlog chain + pivot would otherwise ride through every
    # consumer's plan (guard count, broadcast, curation-v6 composition)
    vocab = register_pin(vocab.localCheckpoint(eager=True))
    oov = with_ln_micro(
        totals, "1", "T + V + 1", "oov_micro"
    ).select("lang", "oov_micro")
    oov_wide = oov.groupBy().pivot("lang", langs).agg(F.first("oov_micro"))
    oov_wide = oov_wide.select(*[F.col(lg).alias(f"oov_{lg}") for lg in langs])
    oov_wide = register_pin(oov_wide.localCheckpoint(eager=True))
    return vocab, oov_wide


def lang_id_ngram(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    langs: list[str] | None = None,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 2,
    max_vocab_rows: int | None = None,
    broadcast_max_rows: int | None = None,
) -> DataFrame:
    """Predict each document's language from its content.

    Returns (doc_id, n_grams, lang_pred, best_micro): ``lang_pred`` is
    the argmax language by exact BIGINT score sum, ties broken by
    language code ascending; ``best_micro`` is that score. Documents
    shorter than ``n`` chars have no grams and are ABSENT (nothing to
    score — callers union them back as 'unknown' if desired).

    ``train_docs`` defaults to ``docs`` (self-training on its own labeled
    ``label_col`` — the batch-curation case); pass a held-out labeled
    frame to avoid label leakage in evaluation settings. ``langs``
    defaults to the training frame's distinct labels (a driver collect
    BOUNDED by the number of real-world language codes — documented tiny).
    """
    train = docs if train_docs is None else train_docs
    if langs is None:
        langs = sorted(
            r[0] for r in train.select(label_col).distinct().collect() if r[0]
        )
    if not langs:
        raise ValueError("lang_id_ngram: no training labels found")
    langs = sorted(langs)
    vocab, oov = train_char_lm(
        train, langs, text_col=text_col, label_col=label_col, n=n,
        max_vocab_rows=max_vocab_rows,
    )
    from .guards import DEFAULT_BROADCAST_MAX_ROWS

    # char-n-gram vocab is bounded by charset^n · |langs| but the guard
    # still counts — above the cap the join degrades to shuffled
    vocab = guarded_broadcast(
        vocab,
        DEFAULT_BROADCAST_MAX_ROWS if broadcast_max_rows is None else broadcast_max_rows,
    )
    scored = (
        gram_frame(docs.select("doc_id", text_col), text_col, n)
        .join(vocab, "gram", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            *[
                F.sum(F.coalesce(F.col(f"lp_{lg}"), F.col(f"oov_{lg}")))
                .cast("long")
                .alias(f"s_{lg}")
                for lg in langs
            ],
        )
    )
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = F.lit(langs[-1])
    for lg in reversed(langs[:-1]):  # earlier codes win exact-integer ties
        pred = F.when(F.col(f"s_{lg}") == best, F.lit(lg)).otherwise(pred)
    return scored.select(
        "doc_id",
        "n_grams",
        pred.alias("lang_pred"),
        best.alias("best_micro"),
    )


def lang_id_oracle_sql(
    langs: list[str],
    n: int = 2,
    table: str = "documents",
    train_pred: str = "TRUE",
    max_vocab_rows: int | None = None,
    score_table: str | None = None,
) -> str:
    """DuckDB mirror of ``lang_id_ngram`` (trained on ``table``'s
    ``lang`` labels filtered by ``train_pred``, scoring ``score_table``
    — defaults to ``table``, i.e. self-training): identical add-one
    micro-nat quantization, identical shared-V smoothing, identical
    argmax + lang-code tie-break."""
    score_table = table if score_table is None else score_table
    langs = sorted(langs)
    grams = _grams_sql("text", n)
    lang_in = ", ".join(f"'{lg}'" for lg in langs)
    vocab_prune = (
        f"""(SELECT gram FROM (
            SELECT gram, sum(c) AS tc FROM counts GROUP BY gram
            ORDER BY tc DESC, gram ASC LIMIT {max_vocab_rows}))"""
        if max_vocab_rows is not None
        else "(SELECT DISTINCT gram FROM counts)"
    )
    s_cols = ",\n           ".join(
        f"CAST(sum(coalesce(v.lp_{lg}, o.oov_{lg})) AS BIGINT) AS s_{lg}"
        for lg in langs
    )
    lp_cols = ",\n           ".join(
        f"max(CASE WHEN lang = '{lg}' THEN lp_micro END) AS lp_{lg}"
        for lg in langs
    )
    oov_cols = ",\n           ".join(
        f"max(CASE WHEN lang = '{lg}' THEN oov_micro END) AS oov_{lg}"
        for lg in langs
    )
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN s_{lg} = {best} THEN '{lg}'" for lg in langs[:-1]
    ) + f" ELSE '{langs[-1]}' END"
    return f"""
    WITH tg AS (
      SELECT lang, unnest({grams}) AS gram FROM {table}
      WHERE lang IN ({lang_in}) AND ({train_pred})),
    counts AS (SELECT lang, gram, count(*) AS c FROM tg GROUP BY lang, gram),
    vkeep AS {vocab_prune},
    kcounts AS (SELECT c.* FROM counts c JOIN vkeep USING (gram)),
    vsz AS (SELECT count(DISTINCT gram) AS V FROM kcounts),
    tot AS (SELECT lang, sum(c) AS T, (SELECT V FROM vsz) AS V
            FROM kcounts GROUP BY lang),
    lp AS ({duckdb_ln_micro_sql(
        "SELECT k.gram, k.lang, k.c, t.T, t.V FROM kcounts k JOIN tot t ON t.lang = k.lang",
        "c + 1", "T + V + 1", "lp_micro", keep_cols="gram, lang")}),
    vocab AS (SELECT gram,
           {lp_cols}
      FROM lp GROUP BY gram),
    oov AS (SELECT
           {oov_cols}
      FROM ({duckdb_ln_micro_sql(
        "SELECT lang, T, V FROM tot",
        "1", "T + V + 1", "oov_micro", keep_cols="lang")})),
    dg AS (SELECT doc_id, unnest({grams}) AS gram FROM {score_table}),
    scored AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           {s_cols}
      FROM dg LEFT JOIN vocab v USING (gram) CROSS JOIN oov o
      GROUP BY doc_id)
    SELECT doc_id, n_grams, {pred} AS lang_pred,
           CAST({best} AS BIGINT) AS best_micro
    FROM scored
    """
