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
        # The fixture events.ts is parquet TIMESTAMP(NANOS); Spark reads it
        # natively as TIMESTAMP_NTZ with ns truncated to µs — the identical
        # values DuckDB's ns→µs read produces. Read it PLAIN so the type the
        # driver's session sees (NTZ) is the type local tests see; every
        # µs-arithmetic call site uses exec_utils.ts_micros, which accepts
        # both NTZ and LTZ. A session that still carries the legacy
        # nanosAsLong conf yields LongType instead — convert that to the
        # same NTZ wall-time (exact under the engine's UTC sessions).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
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
