"""Structured Streaming lift of the dedup primitives.

The reference library is one-pass + mergeable with NO event-time machinery
anywhere (SURVEY.md §2.8: no time type in any Update signature) — so every
sketch stage lifts to a streaming groupBy().agg() for free. This module
demonstrates the two shapes the engine needs:

  1. streaming signature extraction (same mapInPandas kernel — stateless,
     so it is identical code in batch and streaming), and
  2. streaming incremental exact-dedup + windowed rollups with watermarks
     (the stateful shape; first-seen semantics via flatMapGroupsWithState
     analog applyInPandasWithState, or dropDuplicates with watermark).

Batch parity is tested with the file-source -> memory-sink harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdedup.config import DedupConfig
from sparkdedup.operators.signatures import signature_stage


def streaming_signatures(files_stream: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Stateless streaming signature extraction — literally the batch
    operator applied to a streaming DataFrame (mapInPandas is streamable)."""
    return signature_stage(files_stream, cfg)


def streaming_first_seen(docs_stream: DataFrame,
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-dedup: keep the first occurrence of each content
    hash (state bounded by the watermark)."""
    return (
        docs_stream
        .withColumn("text_hash", F.md5("text"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicates(["text_hash"])
    )


def streaming_hourly_rollup(events_stream: DataFrame,
                            watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup (late data handled by watermark)."""
    return (
        events_stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "sum_value")
    )


def streaming_sessionize(events_stream: DataFrame,
                         gap: str = "30 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Watermarked session windows per user (the streaming form of the
    batch sessionization query): Spark's native session_window merges
    events whose gaps are below `gap`; the watermark closes sessions once
    no in-gap event can still arrive. State is bounded by (users x open
    sessions), the same contract as the reference's one-pass mergeable
    sketches."""
    return (
        events_stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events", "sum_value")
    )
