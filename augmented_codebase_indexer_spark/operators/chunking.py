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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    size: int = 40,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, part_index, total_parts, chunk_id, chunk_text, n_tokens).

    Chunk i covers tokens [i·stride, i·stride + size); the final chunk is
    whatever remains (may be shorter). total_parts = 1 for docs with
    ≤ size tokens, else ceil((n − size) / stride) + 1 — exact integer form
    ((n − size + stride − 1) div stride) + 1 so Spark and the SQL oracle
    agree without float division."""
    assert 0 <= overlap < size
    stride = size - overlap
    toks = F.split(F.col(text_col), " ")
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
