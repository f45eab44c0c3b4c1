import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from augmented_codebase_indexer_spark.corpus.generator import generate_corpus, write_corpus
from augmented_codebase_indexer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="aci-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return generate_corpus(n_pages=300, n_entities=60, seed=42)


@pytest.fixture(scope="session")
def corpus_dir(corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    write_corpus(corpus, str(d))
    return str(d)


@pytest.fixture(scope="session")
def cli_warehouse(spark, corpus_dir, tmp_path_factory):
    """A warehouse built once through the CLI's index verb — shared by the
    CLI and HTTP wiring tests. Returns (warehouse_root, build summary)."""
    import os

    from augmented_codebase_indexer_spark.cli import main

    wh = str(tmp_path_factory.mktemp("cli_wh"))
    res = main([
        "index",
        "--pages", os.path.join(corpus_dir, "pages.parquet"),
        "--gazetteer", os.path.join(corpus_dir, "gazetteer.parquet"),
        "--warehouse", wh,
        "--run-id", "cli-run",
    ])
    return wh, res
