"""The join-based linker (huge-gazetteer path) must equal the broadcast
mapInPandas linker — same tiers, same tie-breaks, same unresolved set."""

from pyspark.sql import functions as F

from augmented_codebase_indexer_spark.operators.extraction import (
    broadcast_aliases,
    extract_stage,
    triple_stage,
)
from augmented_codebase_indexer_spark.operators.linking import (
    broadcast_gazetteer,
    linking_stage,
)
from augmented_codebase_indexer_spark.operators.linking_joins import linking_stage_joins


def test_join_linker_equals_broadcast_linker(spark, corpus_dir):
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    gaz = spark.read.parquet(f"{corpus_dir}/gazetteer.parquet")
    gaz_rows = [r.asDict() for r in gaz.select(
        "alias", "ent_id", "canonical_name", "entity_type").collect()]
    alias_bc = broadcast_aliases(spark, [r["alias"] for r in gaz_rows])
    gaz_bc = broadcast_gazetteer(spark, gaz_rows)

    triples = triple_stage(
        extract_stage(pages).filter(
            (F.col("lang") == "en") & (F.length("extracted_text") > 0)
        ),
        alias_bc,
    ).cache()

    def keyset(df):
        return {
            tuple(r)
            for r in df.select("url", "pos", "pred", "subj_id", "obj_id", "resolved").collect()
        }

    a = keyset(linking_stage(triples, gaz_bc))
    b = keyset(linking_stage_joins(triples, gaz))
    assert a == b, (len(a - b), len(b - a), sorted(a - b)[:3], sorted(b - a)[:3])
