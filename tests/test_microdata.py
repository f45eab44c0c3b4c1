"""Microdata + OG extraction (operators/microdata.py): flat scope
binding by segment, ordinal indexing, prop-less scopes, OG pairs."""

from augmented_codebase_indexer_spark.operators.microdata import (
    microdata_items,
    og_meta,
)

DOCS = [
    (1, '<div itemscope itemtype="https://schema.org/Person">'
        '<meta itemprop="name" content="Ada">'
        '<meta itemprop="born" content="1815"></div>'
        '<div itemscope itemtype="https://schema.org/Org">'
        '<meta itemprop="name" content="Acme"></div>'),
    # prop-less scope, then a scoped prop that binds to ITS segment
    (2, '<span itemscope itemtype="https://schema.org/Thing"></span>'
        '<div itemscope itemtype="https://schema.org/Book">'
        '<meta itemprop="isbn" content="978-3"></div>'),
    (3, 'no markup at all'),
    (4, '<head><meta property="og:title" content="A Page">'
        '<meta property="og:type" content="article">'
        '<meta property="og:image" content=""></head>'),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, html string")


def test_microdata_flat_binding(spark):
    got = {tuple(r) for r in microdata_items(_df(spark)).collect()}
    assert got == {
        (1, 1, "https://schema.org/Person", "name", "Ada"),
        (1, 1, "https://schema.org/Person", "born", "1815"),
        (1, 2, "https://schema.org/Org", "name", "Acme"),
        (2, 2, "https://schema.org/Book", "isbn", "978-3"),
    }


def test_og_meta(spark):
    got = {tuple(r) for r in og_meta(_df(spark)).collect()}
    assert got == {
        (4, "title", "A Page"),
        (4, "type", "article"),
        (4, "image", ""),
    }
