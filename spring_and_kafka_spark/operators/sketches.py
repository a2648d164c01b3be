"""Mergeable-sketch aggregation (Datasketches HLL) — the re-aggregable
distinct-count pattern hypertable rollups need at 100 TB.

Exact COUNT(DISTINCT) does not re-aggregate: a daily distinct cannot be
computed from hourly distinct COUNTS, only from the raw rows (or from
mergeable sketches). Spark 4 ships Apache Datasketches HLL natively
(hll_sketch_agg / hll_union_agg / hll_sketch_estimate), so the hourly
materialization can carry a ~1 KB binary sketch per group and every
coarser rollup is a cheap union over sketches — raw events are scanned
exactly once, the continuous-aggregate discipline of
streaming/batch_equiv.py::q_rollup_hier extended to distinct counts.

Imported last in registry._load_all_modules — registers AFTER the
driver's frozen 50-slot verification window prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spring_and_kafka_spark.registry import register
from spring_and_kafka_spark.sources.tables import load_table


@register(
    "q_agg_hll_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           true AS within_tol
    FROM events GROUP BY 1, 2
    """,
)
def q_agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users per event_type, computed the scalable way:
    hourly HLL sketches (one scan of raw events) unioned up to days —
    then CLAIMED against the exact count: within_tol ⇔ the sketch
    estimate lands within ±5% of exact.

    The claim column follows the q_agg_approx discipline (sketch bytes
    are engine-specific, so the estimate itself can't hash-match; the
    boolean claim + exact count can, and the oracle's constant true is
    pinned at every driver SF in tests/test_rows_only_rigor.py).
    Datasketches HLL at the default lgConfigK=12 has ~1.6% relative
    standard error — ±5% is a >3σ margin. The exact branch exists only
    to state the claim; a production rollup keeps the sketch column and
    never recomputes exact."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    daily_est = hourly.groupBy(
        F.date_trunc("day", "h").alias("day"), "event_type"
    ).agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_est"))
    daily_exact = e.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.countDistinct("user_id").alias("n_exact"))
    return daily_exact.join(daily_est, ["day", "event_type"]).select(
        "day",
        "event_type",
        "n_exact",
        (
            F.abs(F.col("n_est") - F.col("n_exact"))
            <= F.col("n_exact") * 0.05
        ).alias("within_tol"),
    )
