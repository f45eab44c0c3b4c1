"""Attack tolerance (operators/graphalgs.py::attack_tolerance): a
hub-dependent star field fragments, a clique survives, isolated
survivors stay in the denominator."""

from augmented_codebase_indexer_spark.operators.graphalgs import (
    attack_tolerance,
)

MICRO = 1_000_000


def _run(spark, edges, k):
    df = spark.createDataFrame(edges, "src string, dst string")
    return attack_tolerance(df, k=k).collect()[0]


def test_star_field_fragments(spark):
    # two stars bridged through their hubs: removing both hubs strands
    # every leaf as a size-1 component
    edges = ([("h1", f"a{i}") for i in range(5)]
             + [("h2", f"b{i}") for i in range(5)]
             + [("h1", "h2")])
    r = _run(spark, edges, k=2)
    assert (r["n_nodes"], r["n_removed"], r["n_survivors"]) == (12, 2, 10)
    assert r["max_component"] == 1
    assert r["giant_share_micro"] == MICRO // 10


def test_clique_survives(spark):
    import itertools

    edges = [(f"k{i}", f"k{j}")
             for i, j in itertools.combinations(range(8), 2)]
    r = _run(spark, edges, k=2)
    assert (r["n_survivors"], r["max_component"]) == (6, 6)
    assert r["giant_share_micro"] == MICRO
