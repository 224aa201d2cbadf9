"""Custom stateful streaming operator: exact-dedup "first seen wins" via
applyInPandasWithState.

Complements streaming/stream_dedup.py (which keeps its state in warehouse
tables because signature indexes are unbounded): here the state is a
bounded-ish per-bucket set of 64-bit content hashes held in Spark's state
store, showing the applyInPandasWithState pattern the engine uses when
state DOES fit the store — schema-typed state, Arrow-batched groups,
checkpoint-recoverable across restarts (the test replays a second
availableNow run against the same checkpoint and the state survives).

State growth is bounded two ways:
- ttl_minutes: processing-time timeout eviction (GroupStateTimeout). A
  bucket idle longer than the TTL is dropped from the state store on the
  next trigger, so a first-seen re-arrival after the TTL re-emits — the
  standard streaming-dedup "dedup within a horizon" contract
  (`dropDuplicates` + watermark has the same semantics).
- the update is incremental in work: new hashes are appended to the prior
  list (no re-sort), and a batch that adds nothing skips state.update()
  entirely. The state-store API itself replaces the whole value per key
  (applyInPandasWithState has no list-append primitive), which is why rows
  hash-partition across n_buckets keys — each rewrite serializes
  total_distinct/n_buckets entries, not the corpus.

Scale note: rows hash-partition across `n_buckets` state keys, so state
per key is total_distinct/n_buckets and the shuffle key is an int. For
unbounded corpora without a TTL horizon, use the warehouse-table design.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from gaoya_spark import hashing

_STATE_SCHEMA = "seen array<long>"


def first_seen_stream(
    stream_df: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    n_buckets: int = 64,
    ttl_minutes: float | None = None,
) -> DataFrame:
    """Emit only the FIRST row for each distinct text value; later exact
    duplicates are dropped. Within a micro-batch the winner among same-text
    rows is the smallest id: applyInPandasWithState makes no contract about
    row order inside a post-shuffle state group, so relying on arrival
    order would be nondeterministic — the group's rows (bounded by the
    micro-batch) are materialized and sorted by id before processing,
    making the result a pure function of (micro-batch partitioning,
    content) and matching a `row_number() OVER (PARTITION BY text ORDER BY
    batch, id)` oracle whenever triggers ingest batches in order.

    ttl_minutes=None dedups over the whole stream lifetime (state grows
    with distinct count); with a TTL, a bucket's seen-set is evicted after
    that long without traffic, bounding state for unbounded streams at the
    cost of re-admitting duplicates older than the horizon.

    MEMORY BOUND: the deterministic tie-break materializes one (bucket x
    micro-batch) group at a time in executor memory — peak per task ~
    micro_batch_rows / n_buckets rows (ids + texts), times the skew factor
    of the bucket hash (xxhash64 on text: near-uniform unless one text
    value dominates, and exact duplicates of one value DO share a bucket
    by design). Size n_buckets so micro_batch_rows / n_buckets fits a
    task comfortably — e.g. 10M-row triggers want n_buckets >= 1024, not
    the demo default of 64; with maxFilesPerTrigger/maxOffsetsPerTrigger
    bounding the batch, state-store pressure, not this buffer, dominates."""
    out_schema = (
        f"{id_col} {dict(stream_df.dtypes)[id_col]}, "
        f"{text_col} string, bucket int"
    )
    ttl_ms = None if ttl_minutes is None else max(int(ttl_minutes * 60_000), 1)

    def dedup_group(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL eviction: the bucket went idle past the horizon
            state.remove()
            return
        old = list(state.get[0]) if state.exists else []
        seen = set(old)
        fresh: list[int] = []
        # deterministic within-trigger tie-break: post-shuffle chunk order
        # is not contractual, so materialize the group (bounded by the
        # micro-batch) and let the smallest id win among same-text rows
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allrows = (
                pd.concat(chunks, ignore_index=True)
                .sort_values(id_col, kind="stable", ignore_index=True)
            )
            hashes = hashing.fnv1a_u64(
                [t.encode("utf-8") for t in allrows[text_col]]
            ).astype("int64")
            keep = []
            for hv in hashes:
                hv = int(hv)
                if hv in seen:
                    keep.append(False)
                else:
                    keep.append(True)
                    seen.add(hv)
                    fresh.append(hv)
            out = allrows[keep]
            if len(out):
                yield out[[id_col, text_col, "bucket"]]
        if fresh:
            # append-only: no re-sort, and no rewrite at all when the
            # batch contained only duplicates (fresh empty, TTL refresh
            # aside)
            state.update((old + fresh,))
        if ttl_ms is not None and (fresh or state.exists):
            state.setTimeoutDuration(ttl_ms)

    buckets = stream_df.select(
        id_col, text_col,
        F.pmod(F.xxhash64(text_col), F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    return buckets.groupBy("bucket").applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
