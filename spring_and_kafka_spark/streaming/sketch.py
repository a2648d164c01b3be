"""Incremental quantile-sketch maintenance — the streaming face of
operators/sketches.py::q_agg_quantile_sketch.

The decimal histogram is a pure counter grid, so the streaming rollup
needs no stateful operator at all: each micro-batch contributes its own
partial (digits, first2, bcnt) histogram written to a batch_id-keyed
partition, and a reader merges by summing per bucket — the same algebra
a 100 TB warehouse uses to keep hourly sketch partitions and answer
any-time-range quantiles by merging the covered hours
(cf. q_agg_hll_rollup for the distinct-count analog). Batch boundaries
cannot change the merged result; tests/test_streaming_advanced.py
asserts stream-merged quantiles == the one-shot batch sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spring_and_kafka_spark.operators.sketches import (
    decimal_histogram,
    select_quantile_buckets,
    to_cents,
)
from spring_and_kafka_spark.streaming.sinks import (
    foreach_batch_sink,
    read_single_state,
)

_SKETCH_SCHEMA = "digits BIGINT, first2 BIGINT, bcnt BIGINT"


def sketch_stream(prices: DataFrame, state_dir: str):
    """Fold a stream of rows with an ``l_extendedprice`` column into
    per-batch partial histograms under ``state_dir``.

    Exactly-once per the foreach_batch_sink contract: each partial
    lands in its own ``batch_id=N`` partition with overwrite, so a
    replayed micro-batch (foreachBatch is at-least-once) rewrites its
    partition instead of double-counting buckets. Empty batches still
    write their (empty) partition — the state directory always exists
    once the query has run."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        decimal_histogram(to_cents(batch_df)).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/batch_id={batch_id}")

    return (
        foreach_batch_sink(prices, on_batch, state_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )


def merged_quantiles(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge the partial histograms (sum bcnt per bucket, the batch_id
    partition column ignored) and resolve the standard quantiles —
    (q, approx_cents) rows identical to what the one-shot histogram
    would answer. A stream that never ran yields the empty answer, not
    a missing-path error; a torn batch (``batch_id=N`` without its
    ``_SUCCESS`` marker — a crash during that write) RAISES via
    read_single_state instead of merging a partial histogram (the r15
    standing cleanup)."""
    from pyspark.sql import functions as F

    partials = read_single_state(spark, state_dir, _SKETCH_SCHEMA, "sketch")
    b = partials.groupBy("digits", "first2").agg(
        F.sum("bcnt").alias("bcnt")
    )
    return select_quantile_buckets(spark, b).select("q", "approx_cents")
