"""Pipeline configuration (analog of the reference's single config dataclass,
``src/aci/core/config.py:55-200``): one frozen dataclass, deterministic defaults,
no wall-clock or environment-dependent values in the data path."""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # ---- input hygiene (reference analogs: scanner.py:283 10MB cap,
    #      grep_searcher.py:224-226 NUL-byte binary skip) ----
    max_html_bytes: int = 10 * 1024 * 1024
    allowed_langs: tuple[str, ...] = ("en",)

    # ---- mention / triple extraction ----
    # closed predicate set produced by the relation-sentence templates
    predicates: tuple[str, ...] = (
        "founded_by",
        "located_in",
        "acquired",
        "works_for",
        "partnered_with",
        "subsidiary_of",
    )

    # ---- entity linking (reference analog: 3-tier symbol resolution,
    #      graph_builder.py:272-297; Qdrant ANN replaced by MinHash-LSH) ----
    minhash_permutations: int = 32
    lsh_bands: int = 8           # 8 bands x 4 rows
    shingle_size: int = 3        # character shingles
    embedding_dim: int = 64      # deterministic hash embedding (fakes.py:295-360 analog)
    link_sim_threshold: float = 0.55
    # above this row count the gazetteer no longer ships as a driver-collected
    # broadcast; build_graph switches to the join-based linker
    # (operators/linking_joins.py) — same tiers, same tie-breaks
    gazetteer_broadcast_max_rows: int = 1_000_000

    # ---- canonicalization / graph algorithms ----
    # cap on a same-as LSH candidate bucket before the self-join would go
    # quadratic (e.g. every entity named "the ..."); capped buckets are
    # counted into warehouse metrics, never silently dropped. 10k² pairs is
    # the worst single bucket we accept (~50M comparisons, one task-second).
    canon_max_bucket_size: int = 10_000
    cc_max_iters: int = 25
    cc_checkpoint_every: int = 4     # localCheckpoint cadence to cut lineage
    pagerank_damping: float = 0.85   # pagerank_scorer.py:22-27
    pagerank_max_iters: int = 50
    pagerank_tol: float = 1e-6
    traversal_max_depth: int = 3     # graph_models.py:141 caps depth

    # ---- skew handling (north_rule: salted keys for hot entities) ----
    salt_buckets: int = 16
    hot_key_threshold: int = 100_000  # rows per key before salting kicks in

    # ---- storage layout ----
    edge_buckets: int = 32           # bucket(N, subj_id) partitioning of edges
    warehouse_dir: str = field(
        default_factory=lambda: os.environ.get(
            "ACI_SPARK_WAREHOUSE", os.path.join(os.getcwd(), ".warehouse")
        )
    )

    # ---- shuffle sizing: tuned for local[32] test harness; on a real
    #      cluster this should be ~2-3x total cores and AQE coalesces ----
    shuffle_partitions: int = 32


DEFAULT = PipelineConfig()
