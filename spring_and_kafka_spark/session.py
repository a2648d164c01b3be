"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
settings below are chosen so the same logical plans scale to a real
multi-executor cluster:

- AQE on (dynamic coalescing, skew-join splitting, runtime join strategy)
- shuffle partitions sized to the local core count rather than the 200
  default (on a cluster this would be ~2-3× total executor cores)
- Arrow enabled so any pandas-UDF path is vectorized
- UTC session timezone so timestamp semantics match the DuckDB oracle
- RocksDB state store for Structured Streaming keyed state (SURVEY §4
  scale rule): the default HDFSBackedStateStoreProvider keeps every
  key's state on the executor HEAP — a hard memory ceiling once keyed
  state (sessionization, dropDuplicatesWithinWatermark, stateful
  aggregations) reaches 100 TB-scale cardinalities. RocksDB spills to
  local disk with an off-heap block cache, bounding executor memory by
  cache size instead of key count. Changelog checkpointing ships per-
  batch deltas instead of full SST snapshots, keeping commit latency
  flat as state grows (OSS Spark ≥ 3.4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spring_and_kafka_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", "/tmp/sks-warehouse")
        # Keyed streaming state on RocksDB (disk-backed, off-heap),
        # not the default heap-backed provider — see module docstring.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark
