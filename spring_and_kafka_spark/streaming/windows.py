"""Streaming windowed/stateful operators (SURVEY.md §2.8).

Every unbounded-state operator takes a watermark — the scale rule that
bounds state at 100 TB (the reference has no event time at all; its
wall-clock pollers map to triggers, not watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count/sum by event_type (the Spring XD "count").
    Works identically on batch and streaming frames (Structured Streaming's
    batch-stream equivalence — tested against q_stream_tumble)."""
    df = events
    if events.isStreaming:
        df = events.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window_size).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window aggregation (overlapping windows)."""
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        df.groupBy(F.window("ts", window_size, slide).alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based) — state closes when the
    watermark passes the gap, so state stays bounded."""
    df = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        df.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful dedup on event_id; with a watermark the seen-keys state is
    dropped once late data can no longer arrive
    (dropDuplicatesWithinWatermark on streams)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])
