"""Fixture-table loading (the engine's batch scan operator).

The reference's only "scan" is the Kafka inbound adapter
(reference: src/main/java/jc/DemoApplication.java:136-159); our batch
equivalent is a Parquet scan with Catalyst predicate pushdown + column
pruning. Tables per /root/repo/FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Filters/projections applied by callers are
    pushed into the Parquet reader by Catalyst (verify with
    ``df.explain('formatted')`` → PushedFilters / ReadSchema)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # The fixture events.ts is parquet TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects; read as long and truncate ns→µs — the
        # same conversion DuckDB applies, so both engines see identical
        # values. Derived events tables (e.g. scale-smoke copies) already
        # carry µs timestamps and need no conversion.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def write_parquet(df: DataFrame, path: str, max_records_per_file: int = 5_000_000) -> None:
    """Parquet sink with target file sizing (scale rule: avoid tiny-file
    explosions at 100 TB — cap records per file, let AQE coalesce)."""
    df.write.option("maxRecordsPerFile", str(max_records_per_file)).mode(
        "overwrite"
    ).parquet(path)
