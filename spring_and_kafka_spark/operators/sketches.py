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
from pyspark.sql import Window as W

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


_CM_DEPTH = 4
_CM_WIDTH = 256  # one md5 hex-digit pair per row → buckets 0..255


@register(
    "q_agg_countmin",
    oracle=f"""
    WITH bi AS (
      SELECT doc_id, ts[i + 1] || ' ' || ts[i + 2] AS bigram
      FROM (
        SELECT doc_id, string_split(text, ' ') AS ts,
               unnest(range(greatest(len(string_split(text, ' ')) - 1, 0)))
                 AS i
        FROM documents
      )
    ),
    counts AS (SELECT bigram, count(*) AS n FROM bi GROUP BY bigram),
    keyed AS (
      SELECT bigram, n,
             {", ".join(
                 f"CAST('0x' || substr(md5(bigram), {2 * d + 1}, 2) AS INTEGER)"
                 f" AS b{d}"
                 for d in range(_CM_DEPTH)
             )}
      FROM counts
    ),
    est AS (
      SELECT bigram, n,
             least({", ".join(
                 f"sum(n) OVER (PARTITION BY b{d})" for d in range(_CM_DEPTH)
             )}) AS cm_est
      FROM keyed
    ),
    ranked AS (
      SELECT bigram, n, CAST(cm_est AS BIGINT) AS cm_est,
             row_number() OVER (ORDER BY n DESC, bigram) AS rn
      FROM est
    )
    SELECT bigram, n, cm_est, cm_est >= n AS no_undercount
    FROM ranked WHERE rn <= 20
    """,
)
def q_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: top-20 corpus bigrams by true frequency,
    each with its Count-Min estimate (depth 4 × width 256) and the
    sketch's one-sided guarantee (estimates never undercount). The
    streaming-friendly frequency sketch: counters are pure sums, so
    partial sketches from any partitioning merge by addition.

    Fully hash-oracled — unlike typical CM implementations there is no
    RNG: row d's hash is md5 hex-digit pair d of the key (the
    q_dedup_simhash recipe), so Spark and DuckDB build bit-identical
    counter arrays and the ESTIMATE ITSELF is verified, not just claimed.

    Shape at 100 TB: bigram counts are one map-side-combined groupBy; the
    4 counter rows are window sums over the COUNTS table (vocabulary-
    sized, not corpus-sized). A true streaming deployment keeps the 4×256
    integer grid as an accumulator instead — this query demonstrates the
    estimate/guarantee semantics on the same arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    # guard: sequence(0, -1) would count DOWN for 1-token docs
    bigram_arr = F.when(
        F.size(ts) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ts) - 2),
            lambda i: F.concat_ws(" ", F.slice(ts, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = d.select(F.explode(bigram_arr).alias("bigram"))
    counts = bi.groupBy("bigram").agg(F.count("*").alias("n"))
    keyed = counts.select(
        "bigram",
        "n",
        *[
            F.conv(F.substring(F.md5("bigram"), 2 * dd + 1, 2), 16, 10)
            .cast("int")
            .alias(f"b{dd}")
            for dd in range(_CM_DEPTH)
        ],
    )
    est = keyed.select(
        "bigram",
        "n",
        F.least(
            *[
                F.sum("n").over(W.partitionBy(f"b{dd}"))
                for dd in range(_CM_DEPTH)
            ]
        ).alias("cm_est"),
    )
    ranked = est.select(
        "bigram",
        "n",
        F.col("cm_est").cast("long").alias("cm_est"),
        F.row_number()
        .over(W.partitionBy().orderBy(F.col("n").desc(), "bigram"))
        .alias("rn"),
    )
    return ranked.filter(F.col("rn") <= 20).select(
        "bigram", "n", "cm_est", (F.col("cm_est") >= F.col("n")).alias("no_undercount")
    )
