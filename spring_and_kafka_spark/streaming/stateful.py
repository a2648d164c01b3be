"""Arbitrary stateful per-key logic (SURVEY.md §2.8): the generalization of
the reference's per-batch handle lambda
(reference: src/main/java/jc/DemoApplication.java:154-157) to keyed,
fault-tolerant streaming state via applyInPandasWithState.

State per key is a (count, total) pair — the kernel is trivial on purpose;
the value is the plumbing: Arrow-batched groups, explicit state schema,
timeout handling, and identical results whether a key's events arrive in
one micro-batch or twenty.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in keyed state; one
    updated row per user per micro-batch (Update output mode)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_alarms", T.LongType()),
        T.StructField("max_cusum_micros", T.LongType()),
        T.StructField("first_alarm_us", T.LongType()),
    ]
)
CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("pre", T.LongType()),
        T.StructField("minpre", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("n_alarms", T.LongType()),
        T.StructField("max_cusum", T.LongType()),
        T.StructField("first_alarm_us", T.LongType()),
    ]
)

_CUSUM_H = 200_000_000


def _update_cusum(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Carry (prefix sum, running min prefix) across micro-batches — the
    two numbers that make the clamp recurrence S_t = max(0, S_{t-1}+d_t)
    resumable: S = pre − min(0, minpre) (operators/timeseries.py::
    q_ts_cusum states the same identity as stacked windows). Rows within
    a batch vectorize as cumsum/cummin; the alarm stats fold into state
    so the last emitted row per key IS the full-history answer."""
    import numpy as np

    if state.exists:
        pre, minpre, n, n_alarms, max_cusum, first_alarm = state.get
    else:
        pre, minpre, n, n_alarms, max_cusum, first_alarm = (
            0, 0, 0, 0, 0, None,
        )
    # a key's micro-batch rows may span several Arrow chunks — assemble
    # the whole batch before sorting, or the recurrence runs out of order
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        pdf = pd.concat(chunks).sort_values(["us", "event_id"])
        pres = pre + np.cumsum(pdf["d"].to_numpy(dtype=np.int64))
        minpres = np.minimum(minpre, np.minimum.accumulate(pres))
        cusums = pres - np.minimum(minpres, 0)
        alarms = cusums > _CUSUM_H
        n += len(pdf)
        n_alarms += int(alarms.sum())
        max_cusum = max(max_cusum, int(cusums.max()))
        pre = int(pres[-1])
        minpre = int(minpres[-1])
        if first_alarm is None and alarms.any():
            first_alarm = int(pdf["us"].to_numpy()[np.argmax(alarms)])
    state.update((pre, minpre, n, n_alarms, max_cusum, first_alarm))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_events": [n],
            "n_alarms": [n_alarms],
            "max_cusum_micros": [max_cusum],
            "first_alarm_us": [first_alarm],
        }
    )


def cusum_stream(deviations: DataFrame) -> DataFrame:
    """Streaming CUSUM over (event_type, event_id, us, d) rows: per-key
    drift state maintained in applyInPandasWithState; one updated
    summary row per key per micro-batch. Equality with the batch
    q_ts_cusum under in-order replay is asserted in
    tests/test_streaming_advanced.py."""
    return deviations.groupBy("event_type").applyInPandasWithState(
        _update_cusum,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
