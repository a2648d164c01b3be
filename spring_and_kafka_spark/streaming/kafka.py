"""Kafka source/sink wrappers reproducing the reference's streaming
contract (SURVEY.md §2.1).

Reference anchors (all in /root/reference):
- topic "event-stream"                src/main/java/jc/DemoApplication.java:42
- producer: async, batch 10, 15 s buffer, keyed by sequence number
                                      src/main/java/jc/DemoApplication.java:112-119
- XML producer: compression           src/main/resources/xml/outbound-kafka-integration.xml:29
- consumer: group, earliest offsets, ≤10 msgs/poll, 100 ms cadence
                                      src/main/java/jc/DemoApplication.java:143-150

Spark mapping: micro-batch trigger ≈ poller cadence; maxOffsetsPerTrigger ≈
maxMessages; startingOffsets=earliest ≈ auto.offset.reset=smallest;
checkpoint ≈ offset commit (stronger: exactly-once sink semantics).
Requires the spark-sql-kafka package on the classpath; tests fall back to
the file-source replay in streaming/replay.py when no broker is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TOPIC = "event-stream"


def kafka_available(spark: SparkSession) -> bool:
    """True when the Kafka connector class is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_stream(
    spark: SparkSession,
    bootstrap_servers: str = "localhost:9092",
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 10,
    include_headers: bool = True,
) -> DataFrame:
    """Kafka inbound adapter analog: poll-consume a topic from the earliest
    offset with a per-batch rate cap, value decoded UTF-8 (String::new)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", str(include_headers).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    cols = [
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp"),
    ]
    if include_headers:
        # headers ARRAY<STRUCT<key STRING, value BINARY>> — the reference's
        # consumer reads the envelope's SEQUENCE_NUMBER header
        # (/root/reference/src/main/java/jc/DemoApplication.java:119), so
        # the adapter must surface them, not project them away.
        cols.append(F.col("headers"))
    return raw.select(*cols)


def write_stream(
    df: DataFrame,
    checkpoint_dir: str,
    bootstrap_servers: str = "localhost:9092",
    topic: str = DEFAULT_TOPIC,
    trigger_ms: int = 100,
    linger_ms: int = 15_000,
    batch_size: int = 10 * 1024,
    compression: str = "none",
):
    """Kafka outbound adapter analog: async batched keyed produce.
    df must carry `key`/`value` string columns (encoder = UTF-8 bytes,
    String::getBytes); the Kafka client hashes key → partition, exactly the
    reference's messageKey routing. A `headers` column
    (ARRAY<STRUCT<key STRING, value BINARY>>), if present, is produced
    onto the record envelope — the reference's producer stamps
    SEQUENCE_NUMBER there (DemoApplication.java:119)."""
    out_cols = [F.col("key").cast("string"), F.col("value").cast("string")]
    if "headers" in df.columns:
        out_cols.append(F.col("headers"))
    return (
        df.select(*out_cols)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("kafka.linger.ms", str(linger_ms))
        .option("kafka.batch.size", str(batch_size))
        .option("kafka.compression.type", compression)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
    )


def message_generator(spark: SparkSession, n: int = 1000) -> DataFrame:
    """Streaming analog of the demo producer: rate source → "#i" messages
    keyed by sequence number (reference: src/main/java/jc/DemoApplication.java:94-101,119)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "100")
        .load()
        .select(
            F.col("value").cast("string").alias("key"),
            F.concat(F.lit("#"), F.col("value").cast("string")).alias("value"),
        )
    )
