"""`aci`-shaped command-line surface over the Spark pipelines.

The reference ships a CLI (`src/aci/cli/__init__.py`: `aci index <path>`,
`aci search <query>`, graph/stat subcommands); SURVEY §7.3 scoped the
interactive REPL out, but the non-interactive verbs map 1:1 onto the
existing plans, so this module closes that surface with a thin argparse
layer — every subcommand parses args, calls the SAME library function the
tests and entry queries use, and prints one JSON line (machine-readable,
like `jobs/build_graph.py`).

    python -m augmented_codebase_indexer_spark.cli index \
        --pages P.parquet --gazetteer G.parquet --warehouse W [--incremental]
    python -m augmented_codebase_indexer_spark.cli search \
        --warehouse W "window join include:docs.example -exclude:src9" -k 5
    python -m augmented_codebase_indexer_spark.cli graph \
        --warehouse W --entity <node_id> --depth 2 --direction out
    python -m augmented_codebase_indexer_spark.cli stats --warehouse W
    python -m augmented_codebase_indexer_spark.cli export \
        --warehouse W --format graphml --out graph.xml

No business logic lives here: search applies the F4/F5 query-modifier
grammar via `functions.queryparse` then delegates to `plans.search`;
`index` delegates to `plans.pipeline.build_graph` /
`operators.incremental.incremental_update`; graph/stats/export read the
warehouse tables. Keeping the CLI logic-free means its behavior is
already covered by the library gates — the CLI tests only assert
wiring (arg → function → printed JSON).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Sequence

from pyspark.sql import SparkSession, functions as F


def _spark(app: str) -> SparkSession:
    from .session import get_spark

    return get_spark(app_name=app)


def _emit(obj) -> None:
    print(json.dumps(obj, sort_keys=True))


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------

def cmd_index(args) -> dict:
    spark = _spark(f"aci-index-{args.run_id}")
    pages = spark.read.parquet(args.pages)
    gaz = spark.read.parquet(args.gazetteer)
    if args.incremental:
        from .operators.incremental import incremental_update
        from .sources.catalog import Warehouse

        return incremental_update(
            spark, Warehouse(args.warehouse, args.run_id), pages, gaz
        )
    from .plans.pipeline import build_graph

    return build_graph(
        spark, pages, gaz, args.warehouse,
        run_id=args.run_id, with_mentions=args.with_mentions,
        dedup_content=args.dedup_content,
    )


def cmd_search(args) -> dict:
    from .functions.queryparse import parse_query, url_predicate
    from .plans.search import hybrid_search, rerank_search
    from .sources.catalog import Warehouse

    spark = _spark("aci-search")
    wh = Warehouse(args.warehouse)
    parsed = parse_query(args.query)
    docs = (
        wh.read(spark, "extracted")
        .filter(url_predicate(parsed))
        # the search plans key on doc_id; the url IS the document id here
        .select(F.col("url").alias("doc_id"), F.col("extracted_text").alias("text"))
    )
    if parsed.phrases:
        # quoted phrases are mandatory consecutive-token filters — pure
        # codegen predicates that fuse into the scan (no join, no UDF)
        from .operators.phrase import phrase_predicate

        for p in parsed.phrases:
            docs = docs.filter(phrase_predicate(p, "text"))
    fn = rerank_search if args.mode == "rerank" else hybrid_search
    rows = [
        r.asDict()
        for r in fn(docs, parsed.terms, k=args.k)
        .withColumnRenamed("item_id", "url")
        .collect()
    ]
    if getattr(args, "snippets", 0) and rows and parsed.terms:
        # snippets only for the k returned urls (a tiny isin filter), a
        # generous window so multi-term spans still cover
        from .operators.postings import (
            first_occurrence_snippets,
            snippet_search,
        )

        hit_docs = docs.filter(
            F.col("doc_id").isin(*[r["url"] for r in rows])
        )
        # parsed.terms is the bare-terms STRING; the snippet operators
        # take a token list
        term_list = parsed.terms.split()
        # best case: one span covering ALL terms; otherwise fall back to
        # a window around the first occurrence of ANY term (OR-semantics
        # rankers return single-term hits)
        snips = {
            r["doc_id"]: r["snippet"]
            for r in first_occurrence_snippets(
                hit_docs, term_list, context=args.snippets
            ).collect()
        }
        snips.update(
            (r["doc_id"], r["snippet"])
            for r in snippet_search(
                hit_docs, term_list, window=50, context=args.snippets
            ).collect()
        )
        for row in rows:
            row["snippet"] = snips.get(row["url"])
    return {"query": parsed.terms, "mode": args.mode, "results": rows}


def cmd_graph(args) -> dict:
    from .operators.traversal import neighborhood
    from .sources.catalog import Warehouse

    spark = _spark("aci-graph")
    wh = Warehouse(args.warehouse)
    edges = wh.read(spark, "edges")
    hood = neighborhood(
        edges, [args.entity], depth=args.depth, direction=args.direction
    )
    rows = sorted(
        (r["node_id"], r["hops"]) for r in hood.collect()
    )
    return {"entity": args.entity, "depth": args.depth,
            "direction": args.direction,
            "neighbors": [{"node_id": n, "hops": h} for n, h in rows]}


def cmd_context(args) -> dict:
    """query_graph analog (SURVEY §3.3): seed neighborhood → rank
    enrich → token-budget truncation ordered by rank. Default ranking is
    global PageRank, solved once per process per warehouse (module-level
    cache — the ≤100k-edge local tier makes that milliseconds on served
    graphs); ``--personalized`` ranks by PPR teleporting to THE SEEDS, so
    the budget keeps what matters near this query, not global hubs."""
    from .operators.pagerank import pagerank, personalized_pagerank
    from .plans.context import assemble_context
    from .sources.catalog import Warehouse

    spark = _spark("aci-context")
    wh = Warehouse(args.warehouse)
    edges = wh.read(spark, "edges")
    nodes = wh.read(spark, "nodes")
    if getattr(args, "personalized", False):
        # seed-dependent — not cacheable per warehouse
        ranks = personalized_pagerank(edges, list(args.entity))
    else:
        # cache key includes a content fingerprint of the edges table so a
        # long-lived process (the HTTP facade) never serves rankings for a
        # graph that was rebuilt externally (watch/import/index) — every
        # commit/upsert path renames into the table directory, bumping its
        # mtime (ADVICE r4: stale _RANK_CACHE)
        key = (args.warehouse, _edges_fingerprint(args.warehouse))
        ranks = _RANK_CACHE.get(key)
        if ranks is None:
            _RANK_CACHE.clear()  # at most one live graph per warehouse
            # the OUTER localCheckpoint is deliberately NOT register_pin'd:
            # it must outlive the request scope (the cache serves later
            # requests); it materializes eagerly here, so releasing the
            # operator-internal pins at scope exit cannot starve it
            ranks = pagerank(edges).localCheckpoint(eager=True)
            _RANK_CACHE[key] = ranks
    ctx = assemble_context(
        edges, nodes, ranks, list(args.entity),
        depth=args.depth, token_budget=args.budget,
    )
    rows = [r.asDict() for r in ctx.collect()]
    return {"seeds": list(args.entity), "budget": args.budget,
            "personalized": bool(getattr(args, "personalized", False)),
            "n_nodes": len(rows), "context": rows}


_RANK_CACHE: dict = {}


def _edges_fingerprint(warehouse: str) -> tuple:
    """Cheap content fingerprint of a warehouse's edges table: the table
    directory's mtime plus its entry list. Both full commits (atomic dir
    rename) and bucket-level upserts (bucket subdir swaps) touch the
    parent directory, so any rebuild changes the fingerprint."""
    import os

    path = os.path.join(warehouse, "edges")
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, tuple(sorted(os.listdir(path))))
    except OSError:
        return ("missing",)


def cmd_watch(args) -> dict:
    """Watch-service verb: drain (or follow) a directory of page parquet
    files into the warehouse through the streaming upsert path. With
    --drain (default) the stream stops once pending input is processed —
    the backfill/cron mode; --follow keeps a 2 s trigger running."""
    from .config import DEFAULT
    from .plans.pipeline import linker_stages
    from .sources.catalog import Warehouse
    from .streaming.watch import run_watch

    spark = _spark("aci-watch")
    wh = Warehouse(args.warehouse)
    # counted size branch (plans/pipeline.py): the gazetteer is only
    # driver-collected when it fits under gazetteer_broadcast_max_rows;
    # above the cap the stream runs the relational join tier — no
    # unconditional full-gazetteer collect on the long-running path
    _, triple_fn, link_fn = linker_stages(
        spark, spark.read.parquet(args.gazetteer), DEFAULT
    )
    canon = wh.read(spark, "canon_map")
    q = run_watch(spark, args.input, wh, triple_fn, link_fn, canon,
                  args.checkpoint, available_now=not args.follow)
    if args.follow:
        q.awaitTermination()
    elif not q.awaitTermination(args.timeout):
        # a timed-out drain must NOT report partial counts as success
        # (no-silent-drops policy); the checkpoint makes the retry safe
        q.stop()
        raise RuntimeError(
            f"watch drain still running after {args.timeout}s — "
            "rerun with the same --checkpoint to continue exactly-once"
        )
    return {"edges": wh.read(spark, "edges").count(),
            "nodes": wh.read(spark, "nodes").count()}


# stats key column per table — what "distinct" means for each
_STATS_KEYS = {
    "extracted": "url", "edges": "subj_id", "nodes": "node_id",
    "canon_map": "alias", "page_index": "url",
}


def cmd_stats(args) -> dict:
    from pyspark.sql import functions as F

    from .operators.hll import M as _HLL_M
    from .operators.hll import hll_estimate, hll_registers
    from .sources.catalog import Warehouse

    spark = _spark("aci-stats")
    wh = Warehouse(args.warehouse)
    sketch = bool(getattr(args, "sketch", False))
    out: dict = {"tables": {}, "distinct": {}}
    for table in ("extracted", "edges", "nodes", "canon_map", "page_index"):
        if not wh.exists(table):
            continue
        df = wh.read(spark, table)
        out["tables"][table] = df.count()
        key = _STATS_KEYS.get(table)
        if key is None or key not in df.columns:
            continue
        if sketch:
            # VERDICT r5 Next #9: the sketch read path — one streaming
            # register aggregation (algebraic, map-side combined; at
            # 10^12 rows this replaces a full distinct shuffle), the
            # ±1.04/sqrt(m) HLL estimate clearly marked display-only
            regs = {
                r["bucket"]: r["max_rho"]
                for r in hll_registers(
                    df.select(F.col(key).cast("string").alias("value"))
                ).collect()
            }
            out["distinct"][table] = {
                "column": key,
                "estimate": round(hll_estimate(regs), 1),
                "method": f"hll-m{_HLL_M} display-only estimate "
                          "(gated values stay exact)",
            }
        else:
            out["distinct"][table] = {
                "column": key,
                "exact": df.select(key).distinct().count(),
            }
    try:
        out["lineage"] = [
            {k: r[k] for k in ("run_id", "stage", "rows")}
            for r in wh.lineage_summary(spark).collect()
        ]
    except Exception:  # no lineage written yet
        out["lineage"] = []
    return out


def cmd_schema(args) -> dict:
    """The 9th verb: run the measure → induce → promote → check loop
    over the warehouse's own edges/nodes and report what schema the
    graph has EARNED — induced domain/range per predicate, which rows
    cleared the evidence bar into declarations, and how much of the
    graph violates them. Read-only; the nightly job
    (`jobs/schema_qa.py`) is the materializing form."""
    from pyspark.sql import functions as F

    from .operators.kgquality import domain_range_violations
    from .operators.typeinduction import (
        induce_domain_range,
        induced_declarations,
    )
    from .sources.catalog import Warehouse

    spark = _spark("aci-schema")
    wh = Warehouse(args.warehouse)
    edges = wh.read(spark, "edges").select(
        F.col("subj_id").alias("subj"), "pred",
        F.col("obj_id").alias("obj"))
    nodes = (
        wh.read(spark, "nodes")
        .select(F.col("node_id").alias("entity"),
                F.col("entity_type").alias("type"))
        .filter(F.col("type").isNotNull())
        .distinct()
    )
    induced = induce_domain_range(edges, nodes)
    decls = induced_declarations(
        induced, args.min_share_micro, args.min_typed)
    nt = nodes.select(F.col("entity").alias("node_id"),
                      F.col("type").alias("node_type"))
    v = domain_range_violations(edges, nt, decls)
    by_pred = {
        r["pred"]: r["n"]
        for r in v.groupBy("pred").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pred").limit(10).collect()
    }
    return {
        "predicates_induced": induced.count(),
        "declarations": sorted(
            (r["pred"], r["domain_type"], r["range_type"])
            for r in decls.collect()
        ),
        "violations": v.count(),
        "violations_by_pred": by_pred,
        "bar": {"min_share_micro": args.min_share_micro,
                "min_typed": args.min_typed},
    }


def cmd_import(args) -> dict:
    """S10 import path: load an exported graph back into warehouse
    tables. 'replace' overwrites nodes/edges; 'merge' unions with the
    existing tables and dedupes on the node/edge keys (the UNIQUE
    constraint analog)."""
    from .sources import graph_io
    from .sources.catalog import Warehouse

    spark = _spark("aci-import")
    wh = Warehouse(args.warehouse)
    if args.format == "graphml":
        nodes, edges = graph_io.import_graphml(spark, args.src)
    elif args.format == "jsonld":
        nodes, edges = graph_io.import_jsonld(spark, args.src)
    elif args.format == "ntriples":
        nodes, edges = graph_io.import_ntriples(spark, args.src)
    else:
        nodes, edges = graph_io.import_graph(spark, args.src)
    if args.mode == "merge" and wh.exists("nodes") and wh.exists("edges"):
        # merge applies to EVERY format: union with the existing tables
        # and dedupe on node_id / the edge-key columns the import format
        # carries (ntriples edges have no provenance columns, so the key
        # shrinks to the columns present). --prefer picks the tie winner:
        # 'existing' (default — a provenance-poor dump can't overwrite
        # provenance-rich rows) or 'imported' (the reference's INSERT OR
        # REPLACE, sqlite.py:466-487 — restore a newer dump over an old
        # warehouse). Shared primitive: graph_io.merge_prefer.
        prefer = getattr(args, "prefer", "existing")
        ex_nodes = wh.read(spark, "nodes").drop("bucket")
        ex_edges = wh.read(spark, "edges").drop("bucket")
        edge_key = [c for c in graph_io.EDGE_KEY if c in edges.columns]
        if prefer == "existing":
            nodes = graph_io.merge_prefer(ex_nodes, nodes, ["node_id"])
            edges = graph_io.merge_prefer(ex_edges, edges, edge_key)
        else:
            nodes = graph_io.merge_prefer(nodes, ex_nodes, ["node_id"])
            edges = graph_io.merge_prefer(edges, ex_edges, edge_key)
    # localCheckpoint before the overwrite-commit: in replace mode the
    # imported frames may read from the very tables being replaced
    nodes = nodes.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    wh.commit(nodes, "nodes")
    wh.commit(edges, "edges", bucket_col="subj_id")
    return {"format": args.format, "mode": args.mode,
            "nodes": nodes.count(), "edges": edges.count()}


def cmd_export(args) -> dict:
    from .sources import graph_io
    from .sources.catalog import Warehouse

    spark = _spark("aci-export")
    wh = Warehouse(args.warehouse)
    nodes, edges = wh.read(spark, "nodes"), wh.read(spark, "edges")
    if args.format == "graphml":
        graph_io.export_graphml(nodes, edges, args.out)
    elif args.format == "jsonld":
        graph_io.export_jsonld(nodes, edges, args.out)
    elif args.format == "ntriples":
        graph_io.export_ntriples(nodes, edges, args.out)
    else:
        graph_io.export_graph(nodes, edges, args.out)
    return {"format": args.format, "out": args.out,
            "nodes": nodes.count(), "edges": edges.count()}


# ---------------------------------------------------------------------------
# parser / entrypoint
# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="aci-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("index", help="build or incrementally update the KG")
    p.add_argument("--pages", required=True)
    p.add_argument("--gazetteer", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--incremental", action="store_true")
    p.add_argument("--with-mentions", action="store_true")
    p.add_argument("--dedup-content", action="store_true")
    p.set_defaults(fn=cmd_index)

    p = sub.add_parser("search", help="hybrid/rerank search over extracted text")
    p.add_argument("query")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--mode", choices=["hybrid", "rerank"], default="hybrid")
    p.add_argument("-k", type=int, default=10)
    p.add_argument(
        "--snippets", type=int, default=0, metavar="CONTEXT",
        help="attach a token-window snippet per hit (CONTEXT tokens "
             "each side of the minimal span covering the query terms)",
    )
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("graph", help="neighborhood of an entity")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--entity", required=True)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--direction", choices=["out", "in"], default="out")
    p.set_defaults(fn=cmd_graph)

    p = sub.add_parser("watch", help="stream a directory of page files into the KG")
    p.add_argument("--input", required=True)
    p.add_argument("--gazetteer", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--follow", action="store_true",
                   help="keep running (default: drain pending input and stop)")
    p.add_argument("--timeout", type=int, default=3600,
                   help="drain-mode wall limit in seconds (error, not partial counts)")
    p.set_defaults(fn=cmd_watch)

    p = sub.add_parser("context", help="token-budgeted context package for seeds")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--entity", action="append", required=True,
                   help="seed node id (repeatable)")
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--budget", type=int, default=2000)
    p.add_argument("--personalized", action="store_true",
                   help="rank by PPR teleporting to the seeds (default: global PageRank)")
    p.set_defaults(fn=cmd_context)

    p = sub.add_parser("stats", help="table counts + lineage summary")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--sketch", action="store_true",
                   help="estimate per-table distinct keys from the HLL "
                        "register tables instead of exact countDistinct "
                        "— the 10^12-scale read path (estimates are "
                        "display-only; every gated value stays exact)")
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser(
        "schema",
        help="induce domain/range from the graph's own evidence and "
             "report declarations + conformance")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--min-share-micro", type=int, default=600_000)
    p.add_argument("--min-typed", type=int, default=3)
    p.set_defaults(fn=cmd_schema)

    p = sub.add_parser("export", help="export nodes/edges")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--format", choices=["json", "jsonld", "graphml", "ntriples"],
                   default="json")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("import", help="import an exported graph into the warehouse")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--format", choices=["json", "jsonld", "graphml", "ntriples"],
                   default="json")
    p.add_argument("--mode", choices=["replace", "merge"], default="replace")
    p.add_argument("--prefer", choices=["existing", "imported"],
                   default="existing",
                   help="merge tie winner: 'existing' keeps warehouse rows "
                        "(provenance-safe default), 'imported' is the "
                        "reference's INSERT OR REPLACE (restore a newer dump)")
    p.add_argument("--src", required=True)
    p.set_defaults(fn=cmd_import)
    return ap


def main(argv: Sequence[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    res = args.fn(args)
    _emit(res)
    return res


if __name__ == "__main__":  # pragma: no cover - exercised via main(argv)
    main(sys.argv[1:])
