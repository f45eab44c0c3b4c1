"""Directed n-gram containment (operators/dedup.py): the quote/
inclusion case Jaccard misses, direction semantics, mutual pairs,
max_df pruning, and DuckDB parity."""

from augmented_codebase_indexer_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)

DOCS = [
    (1, "x y z"),                       # fully inside doc 2
    (2, "x y z a b c d e f"),
    (3, "x y q"),                       # 2/3 inside doc 2 — below 0.9
    (4, "p q r"), (5, "p q r"),         # identical → mutual containment
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_containment_catches_what_jaccard_misses(spark):
    got = {
        (r["contained"], r["container"]): r["containment_micro"]
        for r in ngram_containment_pairs(_df(spark), threshold=0.9).collect()
    }
    assert got == {
        (1, 2): 1_000_000,
        (4, 5): 1_000_000,
        (5, 4): 1_000_000,  # mutual: both directions
    }
    # the (1,2) inclusion is invisible to symmetric Jaccard at any
    # useful threshold: 3/9 ≈ 0.33
    jac = {
        (r["ida"], r["idb"])
        for r in ngram_jaccard_pairs(_df(spark), threshold=0.5).collect()
    }
    assert (1, 2) not in jac and (4, 5) in jac


def test_max_df_prunes_before_the_join(spark):
    # 'x' and 'y' occur in 3 docs; max_df=2 removes them, so doc 1's
    # filtered gram set is {'z'} — still contained in doc 2's
    got = {
        (r["contained"], r["container"]): r["containment_micro"]
        for r in ngram_containment_pairs(
            _df(spark), threshold=0.9, max_df=2
        ).collect()
    }
    assert got[(1, 2)] == 1_000_000


def test_duckdb_parity(spark):
    import duckdb

    lit = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in DOCS
    )
    sql = f"""
    WITH d AS ({lit}),
    tok AS (SELECT DISTINCT doc_id AS id, g.gram FROM d,
            unnest(string_split(text, ' ')) AS g(gram)),
    sizes AS (SELECT id, count(*) sz FROM tok GROUP BY id),
    inter AS (SELECT a.id ida, b.id idb, count(*) n FROM tok a
              JOIN tok b ON a.gram = b.gram AND a.id < b.id GROUP BY 1, 2),
    j AS (SELECT i.*, sa.sz sza, sb.sz szb FROM inter i
          JOIN sizes sa ON sa.id = ida JOIN sizes sb ON sb.id = idb)
    SELECT ida AS contained, idb AS container,
           CAST((n * 1000000) // sza AS BIGINT) AS containment_micro
    FROM j WHERE n * 1000000 >= 900000 * sza
    UNION ALL
    SELECT idb, ida, CAST((n * 1000000) // szb AS BIGINT)
    FROM j WHERE n * 1000000 >= 900000 * szb
    """
    got = sorted(
        map(tuple, ngram_containment_pairs(_df(spark), threshold=0.9).collect())
    )
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want


def test_gram_novelty_hand_computed(spark):
    from augmented_codebase_indexer_spark.operators.dedup import gram_novelty

    corpus = spark.createDataFrame(
        [(100, "x y z"), (101, "p q")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "x y NEW"),       # 1 of 3 grams new
         (2, "a b c"),         # all new
         (3, "x y z p")],      # none new
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_grams"], r["n_new"], r["novelty_micro"])
           for r in gram_novelty(new, corpus).collect()}
    assert got == {
        1: (3, 1, 333_333),
        2: (3, 3, 1_000_000),
        3: (4, 0, 0),
    }


def test_gram_novelty_duckdb_parity(spark):
    import duckdb

    from augmented_codebase_indexer_spark.operators.dedup import (
        gram_novelty,
        gram_novelty_sql,
    )

    corpus_rows = [(100, "x y z"), (101, "p q")]
    new_rows = [(1, "x y NEW"), (2, "a b c"), (3, "x y z p")]
    mk = lambda rows: " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in rows)
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = sorted(map(tuple, gram_novelty(new, corpus).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(
        gram_novelty_sql(mk(new_rows), mk(corpus_rows))).fetchall()))
    assert got == want


def test_prefix_filter_equals_plain_jaccard(spark):
    """PPJoin prefix filtering must be a pure optimization: identical
    output to the plain exact tier, including boundary-exact pairs."""
    from augmented_codebase_indexer_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    rows = [
        (1, "a b c d e"), (2, "a b c d f"),      # J = 4/6 = 0.667
        (3, "a b c"), (4, "a b c"),              # J = 1
        (5, "x y"), (6, "y z"),                  # J = 1/3
        (7, "p q r s"), (8, "p q r t"),          # J = 3/5 = 0.6 exactly
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for thr in (0.6, 0.667, 0.8):
        plain = sorted(map(tuple,
                           ngram_jaccard_pairs(df, threshold=thr).collect()))
        pref = sorted(map(tuple,
                          ngram_jaccard_pairs_prefix(df, threshold=thr).collect()))
        assert pref == plain, thr
    # and on the real sf0.001 corpus with the entry's parameters
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plain = sorted(map(tuple, ngram_jaccard_pairs(
        docs, threshold=0.8, max_df=50).collect()))
    pref = sorted(map(tuple, ngram_jaccard_pairs_prefix(
        docs, threshold=0.8, max_df=50).collect()))
    assert pref == plain and plain  # non-empty on the planted dups
