"""Sliding (hopping) window batch twin — SURVEY.md §2.8.

Registers the EXACT code path tests/test_streaming.py::
test_stream_slide_equals_batch drains through the file-source replay
stream (streaming/windows.py::sliding_counts works identically on batch
and streaming frames), so the driver's hash oracle verifies the same
transformation the streaming variant runs. Kept in its own module,
imported last, so the driver's 50-slot verification window prefix
(frozen in registry order) is not disturbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spring_and_kafka_spark.registry import register
from spring_and_kafka_spark.sources.tables import load_table
from spring_and_kafka_spark.streaming.windows import sliding_counts


@register(
    "q_stream_slide",
    oracle="""
    WITH expanded AS (
      SELECT make_timestamp(
               (CAST(floor(epoch_us(ts) / (15 * 60 * 1000000)) AS BIGINT)
                - k) * 15 * 60 * 1000000
             ) AS win_start,
             event_type
      FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
    )
    SELECT win_start, event_type, count(*) AS n
    FROM expanded
    GROUP BY 1, 2
    """,
)
def q_stream_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window counts per event_type (1 h size, 15 min hop) — the
    hopping-window aggregation Structured Streaming runs with a
    watermark, executed here on the batch frame through the SAME
    sliding_counts transformation the streaming test drains
    (batch≡stream on one code path).

    The oracle replicates each event into its four containing windows by
    pure integer epoch-microsecond arithmetic (the step-aligned instants
    ≤ ts within one window size), then aggregates — exactly Spark's
    sliding-window expansion. Shape at 100 TB: explode factor is
    size/step (4×), then a map-side-combined groupBy on (window, type);
    streaming state is bounded by the watermark horizon times
    windows-per-step."""
    return sliding_counts(load_table(spark, sf_dir, "events"))
