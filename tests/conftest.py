from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spring_and_kafka_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from spring_and_kafka_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    return con


def stage_time_ordered_chunks(
    df, stage: str, n_chunks: int = 6, lo: int = 1, hi: int | None = None
) -> str:
    """Write `df` (an events-shaped frame with ts/event_id) as
    sequential TIME-ORDERED chunk files under `stage`, so a file
    source's modification-time ordering replays the stream in order.
    `lo`/`hi` select a chunk sub-range (1-based, hi exclusive) so resume
    tests can land the first half, stop, then land the rest — the ONE
    shared implementation of the ordering-sensitive staging both
    streaming batteries and the checkpoint-resume tests depend on."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ranked = df.withColumn(
        "chunk", F.ntile(n_chunks).over(W.orderBy("ts", "event_id"))
    )
    for k in range(lo, n_chunks + 1 if hi is None else hi):
        ranked.filter(F.col("chunk") == k).drop("chunk").coalesce(
            1
        ).write.mode("append").parquet(stage)
    return stage
