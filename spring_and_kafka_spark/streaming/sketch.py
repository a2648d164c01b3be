"""Incremental quantile-sketch maintenance — the streaming face of
operators/sketches.py::q_agg_quantile_sketch.

The decimal histogram is a pure counter grid, so the streaming rollup
needs no stateful operator at all: each micro-batch contributes its own
partial (digits, first2, bcnt) histogram, partials append to a parquet
state directory, and a reader merges by summing per bucket — the same
algebra a 100 TB warehouse uses to keep hourly sketch partitions and
answer any-time-range quantiles by merging the covered hours
(cf. q_agg_hll_rollup for the distinct-count analog). Batch boundaries
cannot change the merged result; tests/test_streaming_advanced.py
asserts stream-merged quantiles == the one-shot batch sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spring_and_kafka_spark.operators.sketches import (
    decimal_histogram,
    select_quantile_buckets,
)


def sketch_stream(prices: DataFrame, state_dir: str):
    """Fold a stream of rows with an ``l_extendedprice`` column into
    appended partial histograms under ``state_dir``."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        cents = batch_df.select(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents")
        )
        if cents.isEmpty():
            return
        decimal_histogram(cents).write.mode("append").parquet(state_dir)

    return (
        prices.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", state_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )


def merged_quantiles(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merge the appended partial histograms (sum bcnt per bucket) and
    resolve the standard quantiles — (q, approx_cents) rows identical to
    what the one-shot histogram would answer."""
    b = (
        spark.read.parquet(state_dir)
        .groupBy("digits", "first2")
        .agg(F.sum("bcnt").alias("bcnt"))
    )
    return select_quantile_buckets(spark, b).select("q", "approx_cents")
