"""Streaming windowed/stateful operators (SURVEY.md §2.8).

Every unbounded-state operator takes a watermark — the scale rule that
bounds state at 100 TB (the reference has no event time at all; its
wall-clock pollers map to triggers, not watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ); the fixture parquet reads as
    TIMESTAMP_NTZ. Cast NTZ event time to LTZ — value-exact under the
    UTC sessions this engine builds (session.py) — so the same pipeline
    accepts either type. No-op for LTZ inputs."""
    if isinstance(df.schema[col].dataType, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


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
        df = _event_time(events).withWatermark("ts", watermark)
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
    df = (
        _event_time(events).withWatermark("ts", watermark)
        if events.isStreaming
        else events
    )
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
    df = (
        _event_time(events).withWatermark("ts", watermark)
        if events.isStreaming
        else events
    )
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
        return (
            _event_time(events)
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"])
        )
    return events.dropDuplicates(["event_id"])
