"""Acronym mining (operators/acronyms.py): initials verification, the
minimal-suffix long form, decoy rejection, window clipping."""

from augmented_codebase_indexer_spark.operators.acronyms import mine_acronyms

DOCS = [
    # plain 3-word definition
    (1, "knowledge graph systems (KGS) power search."),
    # candidate window is wider than the definition -> minimal suffix
    (2, "we adopt open data (OD) today."),
    # initials mismatch -> rejected
    (3, "flat rate pricing (XYZ) is a decoy."),
    # acronym longer than available words -> rejected
    (4, "tiny (TLA) case."),
    # two definitions in one doc; case-folded initials
    (5, "a World Health body (WHB) met. central data office (CDO) too."),
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        (r["doc_id"], r["long_form"], r["acronym"])
        for r in mine_acronyms(df).collect()
    }


def test_mining(spark):
    assert _run(spark) == {
        (1, "knowledge graph systems", "KGS"),
        (2, "open data", "OD"),
        (5, "World Health body", "WHB"),
        (5, "central data office", "CDO"),
    }
