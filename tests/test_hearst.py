"""Hearst hypernym extraction (operators/hearst.py): every pattern,
Oxford comma / or variants, multiple matches per doc, and the
lowercase / sentence-boundary negatives."""

from augmented_codebase_indexer_spark.operators.hearst import hearst_hypernyms

DOCS = [
    # all four patterns in one doc, comma variants
    (1, "Cities such as Paris, Lyon and Nice are growing. "
        "Apples, Pears, and other Fruits rot. "
        "Rivers including Rhone flow. "
        "Tools, especially Hammer or Wrench, help."),
    # 'or' list + single-item list + comma before 'including'
    (2, "Colors such as Red or Blue fade. Stars, including Vega, shine."),
    # negatives: lowercase list item blocks the match; trigger inside a
    # word ('dincluding') must not fire; empty text
    (3, "things such as stuff happen. Blendincluding Vega not a trigger."),
    (4, ""),
    # the list must stop at the first non-NP token
    (5, "Metals such as Iron rust quickly and other corrosion follows."),
]

EXPECTED = {
    (1, "Paris", "Cities", "such_as"),
    (1, "Lyon", "Cities", "such_as"),
    (1, "Nice", "Cities", "such_as"),
    (1, "Apples", "Fruits", "and_other"),
    (1, "Pears", "Fruits", "and_other"),
    (1, "Rhone", "Rivers", "including"),
    (1, "Hammer", "Tools", "especially"),
    (1, "Wrench", "Tools", "especially"),
    (2, "Red", "Colors", "such_as"),
    (2, "Blue", "Colors", "such_as"),
    (2, "Vega", "Stars", "including"),
    (5, "Iron", "Metals", "such_as"),
    # doc 5: 'Iron rust quickly and other corrosion' — 'corrosion' is
    # lowercase so and_other does NOT fire ('rust quickly' broke the NP
    # list anyway); doc 3 and 4 emit nothing
}


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_all_patterns_and_negatives(spark):
    got = {
        (r["doc_id"], r["hypo"], r["hyper"], r["pattern"])
        for r in hearst_hypernyms(_docs(spark)).collect()
    }
    assert got == EXPECTED


def test_pred_constant_and_no_shuffle(spark):
    df = hearst_hypernyms(_docs(spark))
    assert df.select("pred").distinct().collect()[0][0] == "is_a"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow: scan -> generate only
