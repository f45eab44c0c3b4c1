"""KV numeric facts (operators/kvfacts.py): grouping strictness,
multi-word labels, lowercase-label rejection, value parsing."""

from augmented_codebase_indexer_spark.operators.kvfacts import (
    kv_numeric_facts,
)

DOCS = [
    (1, "Population: 8,336,817. Area: 783. Founded: 1998."),
    (2, "Total Land Area: 1,234 and Budget Per Year: 22,000,000."),
    (3, "Malformed: 12,34 stays out. also lowercase: 5 stays out."),
    (4, "no frames here"),
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {(r["doc_id"], r["key"], r["raw"], r["value"])
            for r in kv_numeric_facts(df).collect()}


def test_frames(spark):
    assert _run(spark) == {
        (1, "Population", "8,336,817", 8_336_817),
        (1, "Area", "783", 783),
        (1, "Founded", "1998", 1998),
        (2, "Total Land Area", "1,234", 1234),
        (2, "Budget Per Year", "22,000,000", 22_000_000),
        # doc 3: '12,34' breaks strict grouping -> only '12' matches
        (3, "Malformed", "12", 12),
    }
