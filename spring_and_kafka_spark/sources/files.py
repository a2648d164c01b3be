"""File sources/sinks beyond the Parquet fixtures (SURVEY.md §2.1 [X] rows:
"log … could be syslogd, Splunk, HDFS" — reference README.md:331).

Readers take explicit schemas (schema inference is a full extra pass over
the data — never acceptable at 100 TB). Writers expose the layout knobs
that matter at scale: partition columns for pruning, records-per-file
capping against tiny/huge files, and sort-within-partitions for row-group
skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    fmt: str = "parquet",
) -> None:
    """Layout-aware sink: hive-style partition dirs give partition pruning
    on read; sortWithinPartitions tightens parquet min/max stats so
    point/range predicates skip row groups."""
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode("overwrite").option(
        "maxRecordsPerFile", str(max_records_per_file)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
) -> None:
    """Bucketed managed table: both sides of a recurring join bucketed on
    the key join WITHOUT a shuffle (the pre-partitioning is persisted in
    the table layout). The 100 TB answer to 'this join runs every hour'."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink — the other bundled columnar format (Hive-ecosystem
    interchange). Same predicate-pushdown / column-pruning story as
    parquet; kept API-symmetric so a pipeline can switch formats per
    sink without touching its plan."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan with schema from the file footer (self-describing, like
    parquet — unlike the CSV/JSON readers above, which require explicit
    schemas per SURVEY §2.1)."""
    return spark.read.orc(path)
