"""Redirect-chain resolution — pointer doubling over (src, dst) hops.

A web corpus's URL graph carries HTTP-redirect edges; the canonical
identity of a page is its chain's TERMINAL url (the one that actually
serves content). The reference resolves identity chains one hop at a
time while walking its mutable index (re-pointing chunks at the moved
file, `core/indexer.py` update path); a batch engine should not walk
hop-by-hop — a chain of length L would take L sequential joins.

:func:`resolve_redirects` uses pointer doubling (Wyllie's list-ranking
jump, JACM'79; the standard parallel-prefix trick): each round replaces
``next[u] ← next[next[u]]`` and adds the covered hop counts, so a chain
of length L resolves in ⌈log₂ L⌉ self-joins. Every join exchanges only
fixed-width (url, url, hops) rows — never page content — and runs in
lazy blocks with ONE driver action per block (the repo's CC/PageRank
discipline), localCheckpoint cutting lineage between blocks.

Cycles (redirect loops) never reach a terminal; after the bounded
rounds any pointer still landing on a redirecting url is flagged
``is_cycle`` with NULL terminal/hops. Real fetchers behave the same
way: RFC 9110 §15.4 requires loop detection, and browsers give up
after ~20 redirects — so "did not terminate within ``max_chain_len``
hops" and "loop" are deliberately the same verdict (documented, not
silent). ``strict=True`` raises on non-functional input (a src with
two different dst rows), naming the offender count, instead of
resolving an ambiguous graph.

Hop counts are BIGINT sums of exact 1s and the terminal is a pure
string — the DuckDB recursive-CTE oracle is exact by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .guards import register_pin


def resolve_redirects(
    redirects: DataFrame,
    max_chain_len: int = 64,
    checkpoint_every: int = 3,
    strict: bool = True,
) -> DataFrame:
    """redirects(src, dst) → (src, terminal, hops, is_cycle).

    One row per distinct redirecting url. Acyclic chains get their
    terminal url and exact hop count; chains that do not terminate
    within ``max_chain_len`` hops (loops, or over-limit chains — same
    verdict, see module docstring) get (NULL, NULL, true). The round
    count ⌈log₂ max_chain_len⌉+1 guarantees coverage of AT LEAST
    ``max_chain_len`` hops; slightly longer chains may still resolve
    (coverage is 2^rounds, a lower bound, not a cutoff).
    """
    edges = redirects.select("src", "dst").distinct()
    if strict:
        n_conflicts = (
            edges.groupBy("src")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        if n_conflicts:
            raise ValueError(
                f"resolve_redirects: {n_conflicts} src urls redirect to more "
                "than one distinct dst — a redirect map must be functional. "
                "Deduplicate upstream (e.g. keep the latest capture via "
                "cdx.latest_captures) or pass strict=False to resolve the "
                "lexicographically-first dst."
            )
    else:
        edges = edges.groupBy("src").agg(F.min("dst").alias("dst"))

    ptr = edges.select(
        "src",
        F.col("dst").alias("nxt"),
        F.lit(1).cast("long").alias("hops"),
    )
    rounds = max(1, math.ceil(math.log2(max(2, max_chain_len)))) + 1

    done = 0
    while done < rounds:
        block = min(checkpoint_every, rounds - done)
        cur = ptr
        for _ in range(block):
            # jump: nxt ← nxt[nxt], hops ← hops + hops[nxt]; a left-join
            # miss means nxt is already terminal and the row is fixed
            right = cur.select(
                F.col("src").alias("r_src"),
                F.col("nxt").alias("r_nxt"),
                F.col("hops").alias("r_hops"),
            )
            cur = cur.join(right, F.col("nxt") == F.col("r_src"), "left").select(
                "src",
                F.coalesce("r_nxt", "nxt").alias("nxt"),
                (F.col("hops") + F.coalesce("r_hops", F.lit(0))).alias("hops"),
                F.col("r_nxt").isNotNull().alias("moved"),
            )
        cur = register_pin(cur.localCheckpoint(eager=False))
        # the block's ONLY action: materializes the checkpoint (full count,
        # not limit — a partial job would checkpoint only computed
        # partitions) while reading off the last round's movement
        n_moved = cur.filter(F.col("moved")).count()
        ptr = cur.drop("moved")
        done += block
        if n_moved == 0:
            break  # every pointer sits on a terminal — acyclic fixpoint

    open_srcs = (
        edges.select(F.col("src").alias("nxt"))
        .distinct()
        .withColumn("_open", F.lit(True))
    )
    resolved = ptr.join(open_srcs, "nxt", "left")
    return resolved.select(
        "src",
        F.when(F.col("_open").isNull(), F.col("nxt")).alias("terminal"),
        F.when(F.col("_open").isNull(), F.col("hops")).cast("long").alias("hops"),
        F.col("_open").isNotNull().alias("is_cycle"),
    )


def resolve_redirects_sql(edges_sql: str, max_hops: int = 16) -> str:
    """DuckDB mirror: recursive CTE over a closed-form (src, dst)
    relation; paths bounded at ``max_hops`` so loops terminate the
    recursion, then starts that never reached a terminal are cyclic."""
    return f"""
    WITH RECURSIVE r AS ({edges_sql}),
    chains AS (
      SELECT src AS start, dst AS cur, 1 AS h FROM r
      UNION ALL
      SELECT c.start, r.dst, c.h + 1
      FROM chains c JOIN r ON r.src = c.cur
      WHERE c.h < {max_hops}),
    term AS (
      SELECT start, cur AS terminal, h FROM chains
      WHERE cur NOT IN (SELECT src FROM r)),
    allsrc AS (SELECT DISTINCT src FROM r)
    SELECT a.src,
           t.terminal,
           CAST(t.h AS BIGINT) AS hops,
           (t.start IS NULL) AS is_cycle
    FROM allsrc a LEFT JOIN term t ON t.start = a.src
    """
