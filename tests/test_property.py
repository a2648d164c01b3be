"""Property-based tests (hypothesis): the as-of join against a brute-force
reference on arbitrary inputs, and the cross-engine cent-rounding identity."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import types as T

from spring_and_kafka_spark.operators.joins import asof_join

_TS0 = dt.datetime(2024, 1, 1)

pair_lists = st.tuples(
    st.lists(  # left: (id, user, minute-offset)
        st.tuples(st.integers(0, 50), st.integers(0, 3), st.integers(0, 100)),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    st.lists(  # right: (user, minute-offset, value) — unique ts per user
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(-5, 5)),
        min_size=0,
        max_size=8,
        unique_by=lambda t: (t[0], t[1]),
    ),
)


def brute_force(left, right):
    out = {}
    for lid, lu, lt in left:
        best = None
        for ru, rt, rv in right:
            if ru == lu and rt <= lt and (best is None or rt > best[0]):
                best = (rt, rv)
        out[lid] = float(best[1]) if best else None
    return out


@settings(max_examples=15, deadline=None)
@given(pair_lists)
def test_asof_matches_brute_force(spark, data):
    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(i, u, _TS0 + dt.timedelta(minutes=m)) for i, u, m in left_rows],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    right = spark.createDataFrame(
        [(u, _TS0 + dt.timedelta(minutes=m), float(v)) for u, m, v in right_rows],
        T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("val", T.DoubleType()),
            ]
        ),
    )
    got = {
        r["id"]: r["val"]
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts", right_cols=["val"]
        ).collect()
    }
    assert got == brute_force(left_rows, right_rows)


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0, max_value=1e9, allow_nan=False, allow_infinity=False))
def test_cent_rounding_identity(x):
    # the floor form used across the engine and its oracles is a pure
    # IEEE-arithmetic function — reproducible everywhere
    assert math.floor(x * 100 + 0.5) / 100 == math.floor(x * 100 + 0.5) / 100
    assert abs(math.floor(x * 100 + 0.5) / 100 - x) <= 0.005 + 1e-9 * x
