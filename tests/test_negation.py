"""Negated assertions (operators/negation.py): all four frames, the
is_no/is_not_a disambiguation, positive claims never match."""

from augmented_codebase_indexer_spark.operators.negation import (
    negated_assertions,
)

DOCS = [
    (1, "Tomato is not a vegetable."),
    (2, "Pluto is no planet. Rex was never a stray."),
    (3, "Smith denied being an insider."),
    # positive copula must NOT be caught by the negation tier
    (4, "Paris is a city. Paris is an icon."),
    (5, "Ada is not an engineer."),
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {(r["doc_id"], r["subj"], r["obj"], r["frame"])
            for r in negated_assertions(df).collect()}


def test_frames(spark):
    assert _run(spark) == {
        (1, "Tomato", "vegetable", "is_not_a"),
        (2, "Pluto", "planet", "is_no"),
        (2, "Rex", "stray", "never"),
        (3, "Smith", "insider", "denial"),
        (5, "Ada", "engineer", "is_not_a"),
    }
