"""Eval harness (SURVEY.md §7.1 item 10): generate a corpus, run the full
distributed build, score it against the pure-Python oracle AND the planted
ground truth, print one JSON line.

    python scripts/evaluate.py [n_pages] [n_entities] [seed]
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, ".")

from augmented_codebase_indexer_spark.corpus.generator import generate_corpus, write_corpus
from augmented_codebase_indexer_spark.corpus.oracle import run_oracle
from augmented_codebase_indexer_spark.plans.pipeline import build_graph
from augmented_codebase_indexer_spark.session import get_spark


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42

    data = generate_corpus(n_pages=n_pages, n_entities=n_entities, seed=seed)
    d, wh = tempfile.mkdtemp(), tempfile.mkdtemp()
    write_corpus(data, d)
    oracle = run_oracle(data.pages, data.gazetteer)

    spark = get_spark(app_name="aci-evaluate")
    pages = spark.read.parquet(f"{d}/pages.parquet")
    gaz = spark.read.parquet(f"{d}/gazetteer.parquet")
    summary = build_graph(spark, pages, gaz, wh, run_id=f"eval-{seed}")
    got = {
        (r.subj_id, r.pred, r.obj_id, r.url, r.pos)
        for r in spark.read.parquet(f"{wh}/edges").collect()
    }
    tp = len(got & oracle.triples)
    canon = oracle.canonical_map
    planted = {
        (canon.get(t["subj_id"], t["subj_id"]), t["pred"],
         canon.get(t["obj_id"], t["obj_id"]), t["url"])
        for t in data.planted
    }
    g4 = {(a, b, c, u) for (a, b, c, u, p) in got}
    tp2 = len(planted & g4)
    print(json.dumps({
        "n_pages": n_pages, "n_entities": n_entities, "seed": seed,
        "edges": summary["edges"], "nodes": summary["nodes"],
        "unresolved": summary["unresolved"],
        "precision_vs_oracle": round(tp / len(got), 6) if got else None,
        "recall_vs_oracle": round(tp / len(oracle.triples), 6) if oracle.triples else None,
        "precision_vs_planted": round(tp2 / len(g4), 6) if g4 else None,
        "recall_vs_planted": round(tp2 / len(planted), 6) if planted else None,
        "gate": "PASS" if got and tp / len(got) >= 0.95
                and tp / len(oracle.triples) >= 0.95 else "FAIL",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
