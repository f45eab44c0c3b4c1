"""Custom stateful streaming operator via ``applyInPandasWithState``.

Cross-batch first-seen dedup: the watch path's
``dropDuplicatesWithinWatermark`` only deduplicates within the watermark
horizon; content that reappears days later (re-crawls of unchanged pages —
the dominant duplicate class in a web corpus) needs durable per-key state.
State = the content hash last processed per url; a page row passes through
iff its content hash differs from the stored one (the reference's
hash-diff idea, ``indexing_service.py:969-975``, kept as streaming state).

GroupState per url scales: state is partitioned by the grouping key across
executors and checkpointed with the query; timeouts can evict cold urls
(set ``state_ttl_hours`` > 0).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url string, content_hash string, change string"
STATE_SCHEMA = "last_hash string"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import hashlib

    url = key[0]
    last = state.get[0] if state.exists else None
    out_rows = []
    newest = last
    for pdf in pdfs:
        for h in pdf["content_hash"]:
            if h != newest:
                out_rows.append(
                    (url, h, "new" if newest is None else "modified")
                )
                newest = h
    if newest != last:
        state.update((newest,))
    yield pd.DataFrame(out_rows, columns=["url", "content_hash", "change"])


def dedup_pages_stateful(pages_stream: DataFrame) -> DataFrame:
    """streaming pages → (url, content_hash, change) rows only for content
    actually changed since the url was last seen (across ALL micro-batches,
    not just the watermark window)."""
    from pyspark.sql import functions as F

    hashed = pages_stream.select(
        "url", F.sha2(F.col("html"), 256).alias("content_hash")
    )
    return hashed.groupBy("url").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
