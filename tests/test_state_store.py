"""Pin the RocksDB state store for streaming keyed state (SURVEY §4
scale rule, VERDICT r10 item 2).

The default HDFSBackedStateStoreProvider holds every key's state on the
executor heap — at 100 TB keyed-state cardinalities that is an OOM, not
a slowdown. session.get_spark() must therefore configure the
disk-backed RocksDB provider, and a stateful query run under it must
actually materialize RocksDB artifacts (SST files / zipped snapshots /
changelog deltas) in the checkpoint's state directory — asserting the
conf alone would pass even if Spark silently fell back to the heap
provider."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def test_session_configures_rocksdb_provider(spark):
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == ROCKSDB
    )
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        )
        == "true"
    )


def test_stateful_query_writes_rocksdb_state(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    spark.range(2000).select(
        (F.col("id") % 13).alias("k"), F.col("id").alias("v")
    ).write.parquet(src)

    sdf = spark.readStream.schema("k long, v long").parquet(src)
    q = (
        sdf.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("rocksdb_state_probe")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.table("rocksdb_state_probe")
    assert out.count() == 13

    # RocksDB's on-disk layout is unmistakable: SST files under SSTs/
    # or zipped snapshots / .changelog deltas per version. The heap
    # provider writes only `<version>.delta` / `<version>.snapshot`.
    state_files = [
        os.path.basename(p)
        for p in glob.glob(os.path.join(ck, "state", "**", "*"), recursive=True)
        if os.path.isfile(p)
    ]
    rocks = [
        f
        for f in state_files
        if f.endswith(".sst")
        or f.endswith(".zip")
        or f.endswith(".changelog")
    ]
    assert rocks, f"no RocksDB artifacts in state dir, saw: {state_files[:20]}"
