"""Size-guarded broadcast hints for "small by assumption" frames.

A forced ``F.broadcast()`` hint overrides the planner's size check, so a
frame that is only small on a CLEAN corpus (near-dup losers at published
20-50% web dup rates, contaminated-doc ids on a contaminated crawl — the
very case decontamination exists for) OOMs the driver at 10^12 docs
instead of degrading to a shuffled join. The guard counts first and only
hints below a row cap — the same cap-and-observe pattern as
``PipelineConfig.gazetteer_broadcast_max_rows`` (``plans/pipeline.py::
linker_stages``); above the cap the frame is returned unhinted, so the
planner (and AQE at runtime) picks a shuffled or runtime-broadcast join
from REAL sizes. Reference precedent for the size branch: the reference
caps its in-memory symbol cache before spilling to its on-disk index
(`src/aci/services/indexing_service.py:62-63` batches instead of
materializing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ~80 MB of bigint ids — comfortably under Spark's 8 GB broadcast-table
# hard limit and the driver-memory budgets a real cluster runs with
DEFAULT_BROADCAST_MAX_ROWS = 10_000_000


def guarded_broadcast(
    df: DataFrame, max_rows: int | None = DEFAULT_BROADCAST_MAX_ROWS
) -> DataFrame:
    """``F.broadcast(df)`` iff ``df`` counts ≤ ``max_rows``, else ``df``
    unhinted. The frame is persisted either way so the counting pass is
    reused by the consuming join (the codebase's pin-before-reuse
    pattern); ``max_rows=None`` disables the hint entirely (pure
    planner/AQE decision).

    Lifetime note: the pin is NOT released here — release would have to
    happen after the caller's consuming action, which this helper never
    sees. Guarded frames are slim id/signature/vocab sets (bounded by
    the caps the guard enforces) and Spark's LRU cache eviction reclaims
    them under pressure; long-lived processes composing many pipelines
    per session should ``unpersist()`` the consumed frame after their
    action if they need deterministic release."""
    if max_rows is None:
        return df
    df = df.persist()
    if df.count() <= max_rows:
        return F.broadcast(df)
    return df
