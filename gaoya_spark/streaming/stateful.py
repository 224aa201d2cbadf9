"""Custom stateful streaming operator: exact-dedup "first seen wins" via
applyInPandasWithState.

Complements streaming/stream_dedup.py (which keeps its state in warehouse
tables because signature indexes are unbounded): here the state is a
bounded-ish per-bucket set of 64-bit content hashes held in Spark's state
store, showing the applyInPandasWithState pattern the engine uses when
state DOES fit the store — schema-typed state, Arrow-batched groups,
checkpoint-recoverable across restarts (the test replays a second
availableNow run against the same checkpoint and the state survives).

Scale note: rows hash-partition across `n_buckets` state keys, so state
per key is total_distinct/n_buckets and the shuffle key is an int. For
unbounded corpora pair this with a state TTL (GroupStateTimeout /
watermark eviction) or fall back to the warehouse-table design.
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
) -> DataFrame:
    """Emit only the FIRST row (per stream lifetime) for each distinct
    text value; later exact duplicates are dropped. Within a micro-batch,
    arrival order inside the group decides the winner (deterministic per
    batch content)."""
    out_schema = (
        f"{id_col} {dict(stream_df.dtypes)[id_col]}, "
        f"{text_col} string, bucket int"
    )

    def dedup_group(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            hashes = hashing.fnv1a_u64(
                [t.encode("utf-8") for t in pdf[text_col]]
            ).astype("int64")
            keep = []
            for hv in hashes:
                hv = int(hv)
                keep.append(hv not in seen)
                seen.add(hv)
            out = pdf[keep]
            if len(out):
                yield out[[id_col, text_col, "bucket"]]
        state.update((sorted(seen),))

    buckets = stream_df.select(
        id_col, text_col,
        F.pmod(F.xxhash64(text_col), F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    return buckets.groupBy("bucket").applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
