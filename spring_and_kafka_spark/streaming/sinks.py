"""Streaming sinks (SURVEY.md §2.1/§2.8): the reference's terminal `log`
sink and per-batch callback generalized.

Reference anchors: the consumer's terminal handle lambda logging each
(topic, records) entry (reference: src/main/java/jc/DemoApplication.java:154-157)
and the Spring XD `… | log` sink (reference: README.md:331,336).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def log_sink(stream_df: DataFrame, checkpoint_dir: str | None = None, num_rows: int = 20):
    """`| log`: print each micro-batch to the console (bounded rows)."""
    w = stream_df.writeStream.format("console").option("numRows", str(num_rows))
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w


def foreach_batch_sink(
    stream_df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
):
    """The generalized per-batch handle: fn(batch_df, batch_id) runs once
    per micro-batch with a BATCH DataFrame — the escape hatch for sinks
    Spark lacks (JDBC upserts, dual-writes), with exactly-once achieved by
    making fn idempotent on batch_id."""
    w = stream_df.writeStream.foreachBatch(fn)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w


def parquet_sink(stream_df: DataFrame, path: str, checkpoint_dir: str):
    """File sink with exactly-once semantics via the checkpoint WAL (the
    offset-commit analog of reference: src/main/java/jc/DemoApplication.java:144)."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
    )
