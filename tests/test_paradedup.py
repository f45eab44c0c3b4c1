"""Paragraph-level exact dedup (operators/paradedup.py): first-occurrence
keep rule, reassembly order, all-dropped docs, python-mirror and DuckDB
oracle parity."""

import duckdb

from augmented_codebase_indexer_spark.operators.paradedup import (
    paragraph_dedup,
    paragraph_dedup_oracle_sql,
    paragraph_dedup_py,
    split_paragraphs,
)

# the classic shape: a shared footer on every page, one shared banner on
# two pages, and unique body text
DOCS = [
    (1, "unique body one\n\nshared footer text\n\ncookie banner"),
    (2, "unique body two\n\ncookie banner\n\nshared footer text"),
    (3, "shared footer text\n\ncookie banner"),  # nothing unique survives
    (4, "   \n\nunique body four\n\n\n\nshared footer text"),
    (5, ""),  # no paragraphs at all
]


def _paras(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return split_paragraphs(docs)


def _paras_rows(spark):
    return [
        (r["doc_id"], r["pidx"], r["para"]) for r in _paras(spark).collect()
    ]


def test_split_paragraphs(spark):
    rows = sorted(_paras_rows(spark))
    # doc 4: leading blank paragraph dropped, original positions kept
    assert (4, 1, "unique body four") in rows
    assert (4, 2, "shared footer text") in rows
    assert not any(d == 5 for d, _, _ in rows)  # empty doc → no paragraphs
    assert all(p.strip() == p and p != "" for _, _, p in rows)


def test_matches_python_mirror(spark):
    paras = _paras(spark)
    got = sorted(tuple(r) for r in paragraph_dedup(paras).collect())
    want = sorted(paragraph_dedup_py(_paras_rows(spark)))
    assert got == want


def test_matches_duckdb_oracle(spark):
    rows = _paras_rows(spark)
    paras_sql = " UNION ALL ".join(
        f"SELECT {d} AS doc_id, {p} AS pidx, '{t}' AS para"
        for d, p, t in rows
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(paragraph_dedup_oracle_sql(paras_sql)).fetchall()
    )
    got = sorted(
        tuple(r) for r in paragraph_dedup(_paras(spark)).collect()
    )
    assert got == want


def test_first_occurrence_and_reassembly(spark):
    out = {r["doc_id"]: r for r in paragraph_dedup(_paras(spark)).collect()}
    # doc 1 is the first occurrence of both shared paragraphs → intact
    assert out[1]["text"] == "unique body one\nshared footer text\ncookie banner"
    assert out[1]["n_paras"] == 3 and out[1]["n_kept"] == 3
    # doc 2 keeps only its unique body (both shared paras first seen in doc 1)
    assert out[2]["text"] == "unique body two"
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (3, 1)
    # doc 3: everything was seen before → empty text, zero kept
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0
    # doc 4 keeps its unique body; footer was doc 1's
    assert out[4]["text"] == "unique body four"
    # doc 5 had no paragraphs → absent from the paragraph relation
    assert 5 not in out


def test_deterministic(spark):
    a = sorted(tuple(r) for r in paragraph_dedup(_paras(spark)).collect())
    b = sorted(tuple(r) for r in paragraph_dedup(_paras(spark)).collect())
    assert a == b


def test_increment_equals_one_shot(spark):
    from augmented_codebase_indexer_spark.operators.paradedup import (
        paragraph_dedup_increment,
    )

    paras = _paras(spark)
    # arrival-ordered batches: docs 1-2, then 3-5
    b1 = paras.filter("doc_id <= 2")
    b2 = paras.filter("doc_id > 2")
    out1, new1 = paragraph_dedup_increment(b1, None)
    out2, new2 = paragraph_dedup_increment(b2, new1)
    got = sorted(
        tuple(r) for r in out1.unionByName(out2).collect()
    )
    want = sorted(tuple(r) for r in paragraph_dedup(_paras(spark)).collect())
    assert got == want
    # new-hash relations are disjoint and cover exactly the kept paragraphs
    h1 = {r["h"] for r in new1.collect()}
    h2 = {r["h"] for r in new2.collect()}
    assert not h1 & h2
    total_kept = sum(r[2] for r in got)
    assert len(h1) + len(h2) == total_kept


def test_increment_single_batch_equals_batch(spark):
    from augmented_codebase_indexer_spark.operators.paradedup import (
        paragraph_dedup_increment,
    )

    out, _ = paragraph_dedup_increment(_paras(spark), None)
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in paragraph_dedup(_paras(spark)).collect())
    assert got == want
