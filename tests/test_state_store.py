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


def test_cusum_keyed_state_resumes_from_checkpoint(spark, tmp_path):
    """The failure-recovery half of the RocksDB story: a keyed-state
    stream is stopped after draining half the (time-ordered) input,
    new files arrive while it is down, and a restart from the SAME
    checkpoint must CONTINUE the per-key CUSUM carries (prefix sum,
    running min) rather than restart them — final per-key summaries
    equal the batch q_ts_cusum over the full table. State crosses the
    restart through the RocksDB changelog checkpoint; the sink is the
    idempotent batch_id-partition pattern, so a replayed batch
    overwrites itself (exactly-once merge-on-read)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from spring_and_kafka_spark.exec_utils import ts_micros
    from spring_and_kafka_spark.operators.timeseries import q_ts_cusum
    from spring_and_kafka_spark.sources.tables import load_table
    from spring_and_kafka_spark.streaming.replay import read_event_stream
    from spring_and_kafka_spark.streaming.stateful import cusum_stream

    from .conftest import SF_SMOKE

    from .conftest import stage_time_ordered_chunks

    ev = load_table(spark, SF_SMOKE, "events")
    stage = str(tmp_path / "events")

    def add_chunks(lo: int, hi: int) -> None:
        stage_time_ordered_chunks(ev, stage, lo=lo, hi=hi)

    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run_phase() -> None:
        dev = read_event_stream(spark, stage, max_files_per_trigger=1).select(
            "event_type",
            "event_id",
            ts_micros("ts").alias("us"),
            (
                F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long")
                - 60_000_000
            ).alias("d"),
        )

        def on_batch(bdf, bid):
            bdf.write.mode("overwrite").parquet(f"{out_dir}/batch_id={bid}")

        q = (
            cusum_stream(dev)
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    add_chunks(1, 4)
    run_phase()  # drains the first half, then stops (availableNow)
    mid = spark.read.parquet(out_dir)
    assert 0 < mid.count()  # phase 1 really emitted state updates

    add_chunks(4, 7)  # data lands while the job is DOWN
    run_phase()  # restart from the same checkpoint

    out = spark.read.parquet(out_dir)
    last = {}
    for r in out.collect():
        if (
            r.event_type not in last
            or r.n_events > last[r.event_type].n_events
        ):
            last[r.event_type] = r
    streamed = {
        k: (r.n_events, r.n_alarms, r.max_cusum_micros, r.first_alarm_us)
        for k, r in last.items()
    }
    batch = {
        r.event_type: (
            r.n_events,
            r.n_alarms,
            r.max_cusum_micros,
            r.first_alarm_us,
        )
        for r in q_ts_cusum(spark, SF_SMOKE).collect()
    }
    assert streamed == batch


def test_drift_monitor_resumes_and_restart_is_idempotent(spark, tmp_path):
    """Offset-resume for the maintained drift monitor: drain half the
    corpus, stop, add the rest, restart from the same checkpoint — the
    readout equals the batch q_text_js_shift over the full corpus. A
    third restart with NO new data must process zero batches and leave
    the answer unchanged (idempotent recovery)."""
    from pyspark.sql import functions as F

    from spring_and_kafka_spark.llm.text import q_text_js_shift
    from spring_and_kafka_spark.sources.tables import load_table
    from spring_and_kafka_spark.streaming.drift import (
        maintained_js,
        token_delta_stream,
    )

    from .conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents").select("source", "text")
    stage = str(tmp_path / "docs")
    half1 = d.filter(F.crc32(F.col("text")) % 2 == 0)
    half2 = d.filter(
        F.col("text").isNull() | (F.crc32(F.col("text")) % 2 != 0)
    )
    half1.coalesce(2).write.mode("append").parquet(stage)

    state = str(tmp_path / "state")

    def run_phase() -> None:
        docs = (
            spark.readStream.schema(spark.read.parquet(stage).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        q = token_delta_stream(docs, state)
        q.awaitTermination()

    run_phase()
    half2.coalesce(2).write.mode("append").parquet(stage)
    run_phase()

    batch = {
        r.source: (r.n_tokens, r.vocab_size, r.js_bits)
        for r in q_text_js_shift(spark, SF_SMOKE).collect()
    }
    after_resume = {
        r.source: (r.n_tokens, r.vocab_size, r.js_bits)
        for r in maintained_js(spark, state).collect()
    }
    assert after_resume == batch

    run_phase()  # nothing new: zero batches, answer unchanged
    assert {
        r.source: (r.n_tokens, r.vocab_size, r.js_bits)
        for r in maintained_js(spark, state).collect()
    } == batch


def test_attribution_keyed_state_resumes_from_checkpoint(spark, tmp_path):
    """Same failure-recovery shape for the attribution twin: the carried
    (touchpoint us, campaign) struct must survive a stop/restart — a
    click landing before the outage must still win a purchase that
    arrives after it, through the RocksDB changelog checkpoint."""
    from pyspark.sql import functions as F

    from spring_and_kafka_spark.exec_utils import ts_micros
    from spring_and_kafka_spark.operators.analytics import q_attribution
    from spring_and_kafka_spark.sources.tables import load_table
    from spring_and_kafka_spark.streaming.replay import read_event_stream
    from spring_and_kafka_spark.streaming.stateful import attribution_stream

    from .conftest import SF_SMOKE, stage_time_ordered_chunks

    ev = load_table(spark, SF_SMOKE, "events")
    stage = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run_phase() -> None:
        e = read_event_stream(spark, stage, max_files_per_trigger=1).select(
            "user_id",
            "event_id",
            ts_micros("ts").alias("us"),
            "event_type",
            "value",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )

        def on_batch(bdf, bid):
            bdf.write.mode("overwrite").parquet(f"{out_dir}/batch_id={bid}")

        q = (
            attribution_stream(e)
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    stage_time_ordered_chunks(ev, stage, lo=1, hi=4)
    run_phase()  # first half, stop
    stage_time_ordered_chunks(ev, stage, lo=4, hi=7)  # lands while down
    run_phase()  # resume from the same checkpoint

    out = spark.read.parquet(out_dir)
    streamed = {
        r.campaign: (r.n, None if r.rev is None else round(r.rev, 2))
        for r in out.groupBy("campaign")
        .agg(F.count("*").alias("n"), F.sum("value").alias("rev"))
        .collect()
    }
    batch = {
        r.campaign: (r.n_purchases, r.revenue)
        for r in q_attribution(spark, SF_SMOKE).collect()
    }
    assert set(streamed) == set(batch)
    import math

    for c, (n, rev) in batch.items():
        assert streamed[c][0] == n
        if rev is None:
            assert streamed[c][1] is None
        else:
            assert math.isclose(streamed[c][1], rev, abs_tol=0.02)
