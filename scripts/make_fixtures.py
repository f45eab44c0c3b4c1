"""Generate frozen driver-oracle fixtures at /root/repo/tests/fixtures/.

Two of the entry queries cannot be expressed in ANSI SQL directly
(iterative PageRank; the SHA-256 hash embedder), so per VERDICT r1 #2 the
oracle reads outputs precomputed by INDEPENDENT pure-Python/numpy
implementations — frozen here, committed to the repo, regenerable with:

    python scripts/make_fixtures.py [sf_dir]

Fixtures are keyed to sf0.01 (the driver's correctness scale; note
/root/testdata's sf0.001 and sf0.01 documents tables are disjoint datasets).

* pagerank_sf0_01.parquet — numpy PageRank (``pagerank_numpy_mirror``) over
  the derived-page outlink graph, whose edge set is closed-form doc_id
  arithmetic (sources/pages.py): url → '/', '/about', '/entity/Entity{(d*7+13)%50}'.
* hash_embeddings_sf0_01.parquet — float32 hash embeddings of each
  document text (``hashing.hash_embedding``), the corpus side of the
  hybrid-search vector branch.

No Spark anywhere in this script — that independence is the point.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from augmented_codebase_indexer_spark.functions.hashing import hash_embedding
from augmented_codebase_indexer_spark.operators.pagerank import pagerank_numpy_mirror

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures")


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, text FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()

    # --- pagerank over the outlink graph (closed-form edge set) ---
    edges = []
    for doc_id, source, _ in docs:
        url = f"https://docs.example/{source}/{doc_id}"
        obj = (doc_id * 7 + 13) % 50
        edges += [(url, "/"), (url, "/about"), (url, f"/entity/Entity{obj}")]
    pr = pagerank_numpy_mirror(edges, max_iters=30)
    nodes = sorted(pr)
    pq.write_table(
        pa.table({
            "node_id": pa.array(nodes, type=pa.string()),
            "pagerank": pa.array([round(pr[v], 6) for v in nodes], type=pa.float64()),
        }),
        os.path.join(FIXTURE_DIR, "pagerank_sf0_01.parquet"),
    )
    print(f"pagerank fixture: {len(nodes)} nodes")

    # --- personalized pagerank: teleport to the first three source pages
    #     (seed choice mirrored in __spark_entry__.q_ppr) ---
    from augmented_codebase_indexer_spark.operators.pagerank import ppr_numpy_mirror

    seeds = [
        f"https://docs.example/{source}/{doc_id}"
        for doc_id, source, _ in docs
        if doc_id in (0, 1, 2)
    ]
    ppr = ppr_numpy_mirror(edges, seeds, max_iters=30)
    pnodes = sorted(ppr)
    pq.write_table(
        pa.table({
            "node_id": pa.array(pnodes, type=pa.string()),
            "pagerank": pa.array([round(ppr[v], 6) for v in pnodes], type=pa.float64()),
        }),
        os.path.join(FIXTURE_DIR, "ppr_sf0_01.parquet"),
    )
    print(f"ppr fixture: {len(pnodes)} nodes")

    # --- hash embeddings of document texts (float32, = Spark's
    #     ArrayType(FloatType()) cast of the same float64 values) ---
    ids = [d for d, _, _ in docs]
    vecs = [np.asarray(hash_embedding(t, 64), dtype=np.float32) for _, _, t in docs]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], type=pa.list_(pa.float32())),
        }),
        os.path.join(FIXTURE_DIR, "hash_embeddings_sf0_01.parquet"),
    )
    print(f"hash-embedding fixture: {len(ids)} docs")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
