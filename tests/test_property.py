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
    st.lists(  # right: (user, minute-offset, value) — duplicate (user, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(-5, 5)),
        min_size=0,  # allowed: asof_join must break the tie deterministically
        max_size=8,
    ),
)


def brute_force(left, right):
    # Tie-break mirrors asof_join's documented rule: at equal timestamps
    # the row with the greatest value columns survives.
    out = {}
    for lid, lu, lt in left:
        best = None
        for ru, rt, rv in right:
            if ru == lu and rt <= lt and (best is None or (rt, rv) > best):
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


salted_inputs = st.tuples(
    st.lists(st.tuples(st.one_of(st.none(), st.integers(0, 5)), st.integers(0, 99)),
             min_size=0, max_size=10),
    st.lists(st.tuples(st.one_of(st.none(), st.integers(0, 5)), st.text("ab", max_size=2)),
             min_size=0, max_size=6),
    st.sampled_from(["inner", "left"]),
)


@settings(max_examples=10, deadline=None)
@given(salted_inputs)
def test_salted_join_equals_plain_property(spark, data):
    from spring_and_kafka_spark.operators.skew import salted_join

    fact_rows, dim_rows, how = data
    fact = spark.createDataFrame(fact_rows, "k INT, v INT")
    dim = spark.createDataFrame(dim_rows, "dk INT, tag STRING")
    plain = fact.join(dim, fact.k == dim.dk, how).select("k", "v", "tag")
    salted = salted_join(fact, dim, "k", "dk", salt_buckets=4, how=how).select(
        "k", "v", "tag"
    )
    a = sorted(tuple(map(str, r)) for r in plain.collect())
    b = sorted(tuple(map(str, r)) for r in salted.collect())
    assert a == b  # exact equivalence incl. null keys and outer semantics


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0, max_value=1e9, allow_nan=False, allow_infinity=False))
def test_cent_rounding_identity(x):
    # the floor form used across the engine and its oracles is a pure
    # IEEE-arithmetic function — reproducible everywhere
    assert math.floor(x * 100 + 0.5) / 100 == math.floor(x * 100 + 0.5) / 100
    assert abs(math.floor(x * 100 + 0.5) / 100 - x) <= 0.005 + 1e-9 * x
