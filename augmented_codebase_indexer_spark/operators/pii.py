"""PII redaction for training corpora: mask emails, IPv4 addresses, and
phone numbers with typed placeholders, and count what was masked.

Pure JVM ``regexp_replace`` / regex-count expressions — narrow, zero
shuffle, fused into the scan, Arrow never involved. Patterns are kept to
the regex subset where Java (Spark) and RE2 (DuckDB) agree (character
classes, bounded repetition, ``\\b``, no backrefs/lookaround), so the
DuckDB oracle replays the redaction byte-identically; the entry gate
compares sha256 of the redacted text.

Replacement order is fixed (email → ipv4 → phone) and each count is taken
on the text as it stands at that step, so an address inside an email is
never double-counted; the oracle mirrors the same order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (name, pattern, placeholder) — order matters, see module docstring.
# Character classes carry BOTH cases (ADVICE r3: Spark/DuckDB regex
# matching is case-sensitive, so a lowercase-only email rule silently
# passed John.Doe@Example.COM through unredacted); uppercase classes are
# in the Java∩RE2 subset this module restricts itself to.
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "clean_text") -> DataFrame:
    """Adds ``n_email / n_ipv4 / n_phone`` counts and ``out_col`` with every
    match replaced by its placeholder."""
    cur = F.col(text_col)
    out = df
    for name, pat, repl in PII_RULES:
        out = out.withColumn(
            f"n_{name}",
            F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0)).cast("long"),
        )
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumn(out_col, cur)


def redacted_text_expr(text_expr: str = "text") -> str:
    """DuckDB expression: ``text_expr`` with every PII rule applied in
    order — the oracle-side mirror of ``redact_pii``'s output column."""
    cur = text_expr
    for _name, pat, repl in PII_RULES:
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return cur


def redact_pii_oracle_sql(text_expr: str = "text",
                          table: str = "documents") -> str:
    """DuckDB mirror: same rules, same order, counts at each step; returns
    doc_id, the three counts, and sha256 of the redacted text."""
    cur = text_expr
    count_cols = []
    for name, pat, repl in PII_RULES:
        count_cols.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    counts = ",\n           ".join(count_cols)
    return f"""
    SELECT doc_id,
           {counts},
           sha256({cur}) AS clean_sha
    FROM {table}
    """
