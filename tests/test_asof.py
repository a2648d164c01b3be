"""Unit tests for the as-of join on hand-built micro fixtures
(edge cases per SURVEY.md §5.2: empty sides, exact-timestamp ties,
no-prior-match nulls)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spring_and_kafka_spark.operators.joins import asof_join


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


LEFT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def run_asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, LEFT_SCHEMA)
    right = spark.createDataFrame(right_rows, RIGHT_SCHEMA)
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    right_cols=["val"])
    return {r["id"]: r["val"] for r in out.collect()}


def test_asof_basic(spark):
    got = run_asof(
        spark,
        [(1, 10, _ts("2024-01-01T10:00")), (2, 10, _ts("2024-01-01T12:00"))],
        [(10, _ts("2024-01-01T09:00"), 1.0), (10, _ts("2024-01-01T11:00"), 2.0)],
    )
    assert got == {1: 1.0, 2: 2.0}


def test_asof_inclusive_tie(spark):
    # right row at exactly left ts must match (>= semantics)
    got = run_asof(
        spark,
        [(1, 10, _ts("2024-01-01T10:00"))],
        [(10, _ts("2024-01-01T10:00"), 5.0)],
    )
    assert got == {1: 5.0}


def test_asof_no_prior_is_null(spark):
    got = run_asof(
        spark,
        [(1, 10, _ts("2024-01-01T08:00"))],
        [(10, _ts("2024-01-01T09:00"), 1.0)],
    )
    assert got == {1: None}


def test_asof_key_isolation(spark):
    # other users' clicks must not leak across keys
    got = run_asof(
        spark,
        [(1, 10, _ts("2024-01-01T10:00"))],
        [(99, _ts("2024-01-01T09:00"), 7.0)],
    )
    assert got == {1: None}


def test_asof_empty_right(spark):
    got = run_asof(spark, [(1, 10, _ts("2024-01-01T10:00"))], [])
    assert got == {1: None}
