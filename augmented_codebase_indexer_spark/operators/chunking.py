"""Document chunking / smart splitting (W3 completion — the reference's core
pre-embedding operator, ``core/chunker/chunker.py:85-298`` fixed 50-line /
5-overlap chunks with an 8192-token cap, and ``core/chunker/
smart_splitter.py:59-339`` split-point priorities; ``chunker.py`` also
numbers parts — part_index / total_parts — which is W3 in SURVEY §2.5).

Web-text re-expression: documents are flat prose, so the chunk unit is the
whitespace TOKEN (the reference's unit is the source line); a chunk is
``size`` tokens with ``overlap`` tokens carried over from the previous
chunk (stride = size − overlap). The reference's split-point priority
(``smart_splitter.py:306-316``) ranks structural boundaries of CODE
(class > function > blank line); flat prose has only sentence boundaries,
and fixed-stride windows with overlap are the standard web-corpus choice —
the overlap is what guarantees no planted fact straddles a cut unseen.

Everything is closed-form integer arithmetic over the token array — pure
JVM expressions (sequence → transform → explode), no Python, no shuffle:
chunking is a narrow per-row flatMap however large the corpus. Chunk ids
are deterministic ``sha2(doc_id:start:end)`` (SURVEY §1.1: the reference's
uuid4 chunk ids are the nondeterminism bug we do NOT replicate,
``chunker/models.py:29``).

The whole operator is SQL-mirrorable: the DuckDB oracle replays the same
arithmetic over ``string_split`` (see ``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    size: int = 40,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """→ (doc_id, part_index, total_parts, chunk_id, chunk_text, n_tokens).

    Chunk i covers tokens [i·stride, i·stride + size); the final chunk is
    whatever remains (may be shorter). total_parts = 1 for docs with
    ≤ size tokens, else ceil((n − size) / stride) + 1 — exact integer form
    ((n − size + stride − 1) div stride) + 1 so Spark and the SQL oracle
    agree without float division.

    Tokenizer hook: by default tokens are the hermetic whitespace split of
    ``text_col`` (SQL-mirrorable — the gated default). Pass ``tokens_col``
    naming an ``array<string>`` column produced by ANY tokenizer (e.g. a
    real BPE via ``tokenize_with``) and chunk boundaries, counts, and ids
    are computed over those tokens instead; ``chunk_text`` is then the
    space-join of the chunk's tokens."""
    assert 0 <= overlap < size
    stride = size - overlap
    toks = F.col(tokens_col) if tokens_col else F.split(F.col(text_col), " ")
    n = F.size(toks)
    # floor division explicitly on both engines: DuckDB CAST(double AS INT)
    # rounds, Spark's truncates — `floor` / `//` sidestep the divergence
    total = F.when(n <= size, F.lit(1)).otherwise(
        F.floor((n - size + stride - 1) / stride).cast("int") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), total - 1),
        lambda i: F.struct(
            i.alias("part_index"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, size)).alias("chunk_text"),
            F.least(F.lit(size), n - i * stride).alias("n_tokens"),
            (i * stride).alias("start_tok"),
        ),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), total.alias("total_parts"),
                  F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.part_index").alias("part_index"),
            "total_parts",
            F.sha2(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    F.col("c.start_tok").cast("string"),
                    (F.col("c.start_tok") + F.col("c.n_tokens")).cast("string"),
                ),
                256,
            ).alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


def tokenize_with(
    df: DataFrame,
    tokenizer,
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Wrap ANY python tokenizer (str → list[str]; e.g. tiktoken's
    ``encode`` + per-token decode where available) into an Arrow-batched
    column for ``chunk_documents(..., tokens_col=out_col)``. The hermetic
    default path never calls this — it exists so real token budgets slot in
    without touching the chunk arithmetic (VERDICT r2 ask #6)."""
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def tok_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda x: tokenizer(x) if x is not None else [])

    return df.withColumn(out_col, tok_udf(F.col(text_col)))


# nearest-boundary encoding: min over (distance·ENC + position) picks the
# closest boundary, ties to the smaller position; ENC just has to exceed
# any document's token count
_ENC = 1_000_000


def chunk_documents_sentence(
    df: DataFrame,
    size: int = 40,
    overlap: int = 10,
    tol: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-boundary chunking (smart-splitter parity — the reference
    ranks split points so chunks don't cut mid-unit,
    ``core/chunker/smart_splitter.py:59-339``; for flat prose the unit is
    the sentence).

    Same windowing as ``chunk_documents`` except each nominal cut point
    p = i·stride (i ≥ 1) SNAPS to the nearest sentence boundary within
    ±``tol`` tokens — a boundary being the position after a token ending
    in '.' — and stays at p when the window holds none. Chunk i then
    covers [pᵢ', min(pᵢ' + size, n)), except the LAST chunk, which covers
    [p', n) — up to size + tol tokens — so a left-snapped final cut cannot
    orphan the tail. With tol ≤ overlap/2 (asserted) every token is covered
    by ≥ 1 chunk: chunk i+1 starts at most sᵢ + stride + tol while chunk i
    ends at sᵢ' + size ≥ sᵢ − tol + size ≥ that (or runs to n if last).

    Still closed-form array arithmetic (split → boundary positions →
    min-encode), zero Python, zero shuffle, and exactly mirrorable in
    DuckDB (``chunk_sentence_oracle_sql``)."""
    assert 0 <= overlap < size
    if tol is None:
        tol = overlap // 2
    assert 0 <= tol <= overlap // 2, "tol > overlap/2 can skip tokens"
    stride = size - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # the min-encode snap wraps (corrupts silently) at _ENC tokens, and the
    # 10 MB page cap upstream admits ~2M-token documents (ADVICE r3) — so
    # oversized docs raise instead of snapping to a wrong boundary; the
    # guard rides on `total`, which every row computes
    total = F.when(
        n >= _ENC,
        F.raise_error(
            F.concat(
                F.lit(f"chunk_documents_sentence: document exceeds {_ENC - 1} "
                      "tokens (min-encode snap would wrap); doc_id="),
                F.col(id_col).cast("string"),
            )
        ).cast("int"),
    ).when(n <= size, F.lit(1)).otherwise(
        F.floor((n - size + stride - 1) / stride).cast("int") + 1
    )
    # boundary positions: cut BEFORE token j+1 when token j (0-based) ends
    # with '.'; interior cuts only (a boundary at n would make empty chunks)
    bpos = F.filter(
        F.transform(toks, lambda t, j: F.when(t.endswith("."), j + 1).otherwise(-1)),
        lambda b: (b >= 1) & (b < n),
    )

    def snapped(i):
        p = i * stride
        cands = F.filter(bpos, lambda b: F.abs(b - p) <= tol)
        best = F.array_min(F.transform(cands, lambda b: F.abs(b - p) * _ENC + b))
        return F.when(i == 0, F.lit(0)).otherwise(
            F.coalesce(best % _ENC, p).cast("int")
        )

    chunks = F.transform(
        F.sequence(F.lit(0), total - 1),
        lambda i: F.struct(
            i.alias("part_index"),
            snapped(i).alias("start_tok"),
        ),
    )
    # last chunk absorbs the remainder (≤ size + tol tokens) — a final cut
    # snapped LEFT must not orphan the tail tokens
    n_tok = F.when(
        F.col("c.part_index") == F.col("total_parts") - 1,
        F.col("__n") - F.col("c.start_tok"),
    ).otherwise(F.least(F.lit(size), F.col("__n") - F.col("c.start_tok")))
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("__toks"),
                  n.alias("__n"), total.alias("total_parts"),
                  F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.part_index").alias("part_index"),
            "total_parts",
            F.sha2(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    F.col("c.start_tok").cast("string"),
                    (F.col("c.start_tok") + n_tok).cast("string"),
                ),
                256,
            ).alias("chunk_id"),
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("c.start_tok") + 1, n_tok)
            ).alias("chunk_text"),
            n_tok.cast("int").alias("n_tokens"),
        )
    )


def chunk_sentence_oracle_sql(
    size: int = 40, overlap: int = 10, tol: int | None = None,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB mirror of ``chunk_documents_sentence`` — same boundary set,
    same min-encode snap, same integer arithmetic."""
    if tol is None:
        tol = overlap // 2
    stride = size - overlap
    return f"""
    WITH base AS (
      SELECT {id_col} AS doc_id, string_split({text_col}, ' ') AS toks,
             len(string_split({text_col}, ' ')) AS n
      FROM {table}
    ),
    sized AS (
      SELECT doc_id, toks, n,
             CASE WHEN n <= {size} THEN 1
                  ELSE CAST((n - {size} + {stride} - 1) // {stride} AS INT) + 1 END AS total_parts,
             list_filter(list_transform(range(1, n + 1),
                                        j -> CASE WHEN toks[j] LIKE '%.' THEN j ELSE -1 END),
                         b -> b >= 1 AND b < n) AS bpos
      FROM base
    ),
    exploded AS (
      SELECT doc_id, toks, n, total_parts, CAST(i AS INT) AS part_index,
             CASE WHEN i = 0 THEN 0
                  ELSE CAST(coalesce(
                         list_min([abs(b - i*{stride})*{_ENC} + b
                                   FOR b IN bpos IF abs(b - i*{stride}) <= {tol}]) % {_ENC},
                         i*{stride}) AS INT) END AS start_tok
      FROM sized, unnest(range(0, total_parts)) AS r(i)
    ),
    with_len AS (
      SELECT *, CASE WHEN part_index = total_parts - 1 THEN n - start_tok
                     ELSE least({size}, n - start_tok) END AS n_tok
      FROM exploded
    )
    SELECT doc_id, part_index, total_parts,
           sha256(doc_id || ':' || start_tok || ':' || (start_tok + n_tok)) AS chunk_id,
           array_to_string(toks[start_tok + 1 : start_tok + n_tok], ' ') AS chunk_text,
           CAST(n_tok AS INT) AS n_tokens
    FROM with_len
    """


def chunk_oracle_sql(size: int = 40, overlap: int = 10, table: str = "documents",
                     id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror of ``chunk_documents`` — same integer arithmetic over
    string_split, generated from the same parameters."""
    stride = size - overlap
    return f"""
    WITH base AS (
      SELECT {id_col} AS doc_id, string_split({text_col}, ' ') AS toks,
             len(string_split({text_col}, ' ')) AS n
      FROM {table}
    ),
    sized AS (
      SELECT doc_id, toks, n,
             CASE WHEN n <= {size} THEN 1
                  ELSE CAST((n - {size} + {stride} - 1) // {stride} AS INT) + 1 END AS total_parts
      FROM base
    ),
    exploded AS (
      SELECT doc_id, total_parts, CAST(i AS INT) AS part_index,
             array_to_string(toks[i*{stride}+1 : i*{stride}+{size}], ' ') AS chunk_text,
             least({size}, n - i*{stride}) AS n_tokens,
             i*{stride} AS start_tok
      FROM sized, unnest(range(0, total_parts)) AS r(i)
    )
    SELECT doc_id, part_index, total_parts,
           sha256(doc_id || ':' || start_tok || ':' || (start_tok + n_tokens)) AS chunk_id,
           chunk_text, CAST(n_tokens AS INT) AS n_tokens
    FROM exploded
    """
