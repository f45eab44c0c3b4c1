"""Quotation attribution (operators/quotes.py): all three frames, the
capitalization gate, orphan quotes, multiple matches per doc."""

from augmented_codebase_indexer_spark.operators.quotes import attribute_quotes

DOCS = [
    # all three frames in one doc
    (1, '"we shipped it" said Alice3. Bob said: "growth is back". '
        '"costs fell," Carol added.'),
    # orphan quote and lowercase speaker never attribute
    (2, '"an orphan thought" stands alone. "mumble" said nobody.'),
    # two matches of the same frame in one doc
    (3, '"first" said Dan. "second" says Eve.'),
    # says + told variants
    (4, 'Frank says: "it works". "be careful," Grace warned.'),
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        (r["doc_id"], r["frame"], r["quote"], r["speaker"])
        for r in attribute_quotes(df).collect()
    }


def test_frames_and_gates(spark):
    got = _run(spark)
    assert got == {
        (1, "post_said", "we shipped it", "Alice3"),
        (1, "pre_said", "growth is back", "Bob"),
        (1, "comma_attrib", "costs fell", "Carol"),
        (3, "post_said", "first", "Dan"),
        (3, "post_said", "second", "Eve"),
        (4, "pre_said", "it works", "Frank"),
        (4, "comma_attrib", "be careful", "Grace"),
    }
    # doc 2 contributes nothing: orphan + lowercase speaker both gated
    assert not any(d == 2 for d, *_ in got)
