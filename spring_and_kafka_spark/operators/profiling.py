"""Data-quality / governance profiling operators — the audit pass every
training-data warehouse runs before a corpus ships: column profiles,
key-skew diagnostics, k-anonymity checks, and experiment readouts
(the reference's "count, filter, enrich or transform" event model,
reference README.md:329, grown to the curation-governance surface).

All four reduce to one or two hash aggregations over the fact table —
the profile rows that come back are tiny (one per column / key / arm),
so at 100 TB each query is a single map-side-combined shuffle whose
reduce side holds group cardinality, never input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from spring_and_kafka_spark.exec_utils import ts_micros
from spring_and_kafka_spark.registry import register
from spring_and_kafka_spark.sources.tables import load_table


@register(
    "q_profile",
    oracle="""
    SELECT 'event_id' AS col_name, count(*) AS n_rows,
           count(*) - count(event_id) AS n_nulls,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(min(event_id) AS DOUBLE) AS min_num,
           CAST(max(event_id) AS DOUBLE) AS max_num
    FROM events
    UNION ALL
    SELECT 'ts', count(*), count(*) - count(ts),
           CAST(count(DISTINCT ts) AS BIGINT),
           CAST(epoch_us(min(ts)) AS DOUBLE), CAST(epoch_us(max(ts)) AS DOUBLE)
    FROM events
    UNION ALL
    SELECT 'user_id', count(*), count(*) - count(user_id),
           CAST(count(DISTINCT user_id) AS BIGINT),
           CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE)
    FROM events
    UNION ALL
    SELECT 'event_type', count(*), count(*) - count(event_type),
           CAST(count(DISTINCT event_type) AS BIGINT), NULL, NULL
    FROM events
    UNION ALL
    SELECT 'value', count(*), count(*) - count(value),
           CAST(count(DISTINCT value) AS BIGINT),
           floor(min(value) * 1e6 + 0.5) / 1e6,
           floor(max(value) * 1e6 + 0.5) / 1e6
    FROM events
    UNION ALL
    SELECT 'props', count(*), count(*) - count(props),
           CAST(count(DISTINCT props) AS BIGINT), NULL, NULL
    FROM events
    """,
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of the events table: row count, null count,
    exact distinct count, numeric min/max (timestamps as epoch
    microseconds) — one output row per column, the schema-drift /
    data-quality readout a warehouse materializes per partition-day.

    One aggregation pass over the input: every per-column statistic is an
    expression in a single ``agg`` (Catalyst plans the multi-distinct via
    one Expand node), then the single result row is exploded into the
    per-column shape — no per-column rescans, unlike the naive UNION-ALL
    the DuckDB oracle runs. At 100 TB the exact count(DISTINCT) pass is
    the deliberate luxury here (the oracle must replay it bit-for-bit);
    the production knob is swapping approx_count_distinct into the same
    expression slot (the HLL path q_agg_hll_rollup already exercises)."""
    e = load_table(spark, sf_dir, "events")

    def stats(col: str, minmax: F.Column | None) -> F.Column:
        return F.struct(
            F.lit(col).alias("col_name"),
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            (F.min(minmax) if minmax is not None else F.lit(None)).cast(
                "double"
            ).alias("min_num"),
            (F.max(minmax) if minmax is not None else F.lit(None)).cast(
                "double"
            ).alias("max_num"),
        )

    one = e.agg(
        stats("event_id", F.col("event_id")).alias("s1"),
        stats("ts", ts_micros("ts")).alias("s2"),
        stats("user_id", F.col("user_id")).alias("s3"),
        stats("event_type", None).alias("s4"),
        F.struct(
            F.lit("value").alias("col_name"),
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count("value")).alias("n_nulls"),
            F.countDistinct("value").alias("n_distinct"),
            (F.floor(F.min("value") * 1e6 + 0.5) / 1e6).alias("min_num"),
            (F.floor(F.max("value") * 1e6 + 0.5) / 1e6).alias("max_num"),
        ).alias("s5"),
        stats("props", None).alias("s6"),
    )
    return one.select(
        F.explode(F.array("s1", "s2", "s3", "s4", "s5", "s6")).alias("p")
    ).select("p.*")


_KANON_K = 5


@register(
    "q_kanon",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS acct_band,
             count(*) AS n
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST({_KANON_K} AS BIGINT) AS k,
           count(*) AS n_groups,
           CAST(sum(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(sum(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           round(sum(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END)
                 * 1.0 / sum(n), 6) AS frac_at_risk
    FROM g
    """,
)
def q_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation, market segment,
    account-balance band): how many identity groups have fewer than k=5
    members, and what fraction of rows sit in such re-identifiable
    groups — the privacy gate a person-derived training corpus must pass
    before release.

    Two chained aggregations, both map-side combinable: groupBy the
    quasi-identifier tuple (the only shuffle that sees data volume), then
    a global reduce over group sizes. Group cardinality, not row count,
    bounds the second stage — the 100 TB cost is one shuffle."""
    c = load_table(spark, sf_dir, "customer")
    g = (
        c.withColumn(
            "acct_band", F.floor(F.col("c_acctbal") / 1000).cast("long")
        )
        .groupBy("c_nationkey", "c_mktsegment", "acct_band")
        .agg(F.count("*").alias("n"))
    )
    small = F.col("n") < _KANON_K
    return g.agg(
        F.lit(_KANON_K).cast("long").alias("k"),
        F.count("*").alias("n_groups"),
        F.sum(small.cast("long")).alias("n_small_groups"),
        F.sum(F.when(small, F.col("n")).otherwise(0)).alias("n_rows_at_risk"),
        F.round(
            F.sum(F.when(small, F.col("n")).otherwise(0)) / F.sum("n"), 6
        ).alias("frac_at_risk"),
    )


@register(
    "q_heavy_hitters",
    oracle="""
    WITH k AS (
      SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1
    ),
    r AS (
      SELECT key, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, key) AS BIGINT)
               AS rnk,
             sum(cnt) OVER () AS total,
             sum(cnt) OVER (ORDER BY cnt DESC, key
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM k
    )
    SELECT rnk, key, CAST(cnt AS BIGINT) AS cnt,
           round(cnt * 1.0 / total, 6) AS share,
           round(cum * 1.0 / total, 6) AS cum_share
    FROM r WHERE rnk <= 20
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 20 heaviest l_partkey values with
    their absolute counts, share of all rows, and the cumulative share
    curve — the readout that decides whether a join needs the salted
    path (operators/skew.py) before it runs.

    groupBy(key) is the only shuffle that sees input rows; the windows
    (rank, running share) run over the key-cardinality aggregate, and the
    single-partition window is over key groups, not rows — at 100 TB with
    a few million distinct keys that is still one executor's work, and
    the exact answer is the point of a diagnostic. Ties break by key so
    the top-20 is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    order = W.orderBy(F.col("cnt").desc(), "key")
    r = k.select(
        F.row_number().over(order).alias("rnk"),
        "key",
        "cnt",
        F.sum("cnt").over(W.partitionBy()).alias("total"),
        F.sum("cnt").over(order.rowsBetween(W.unboundedPreceding, 0)).alias(
            "cum"
        ),
    )
    return r.filter(F.col("rnk") <= 20).select(
        "rnk",
        "key",
        "cnt",
        F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
        F.round(F.col("cum") / F.col("total"), 6).alias("cum_share"),
    )


@register(
    "q_ab_test",
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS arm,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY 1, 2
    ),
    a AS (
      SELECT arm, count(*) AS n, sum(conv) AS c FROM u GROUP BY 1
    ),
    wide AS (
      SELECT
        CAST(max(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
        CAST(max(CASE WHEN arm = 0 THEN c END) AS BIGINT) AS conv_a,
        CAST(max(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
        CAST(max(CASE WHEN arm = 1 THEN c END) AS BIGINT) AS conv_b
      FROM a
    )
    SELECT n_a, conv_a, n_b, conv_b,
           round(conv_b * 1.0 / n_b - conv_a * 1.0 / n_a, 6) AS lift,
           round((conv_b * 1.0 / n_b - conv_a * 1.0 / n_a)
                 / sqrt((conv_a + conv_b) * 1.0 / (n_a + n_b)
                        * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 4) AS z
    FROM wide
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout: users split into arms by a
    deterministic key rule (user_id % 2 — production would hash with an
    experiment salt, cf. q_sample_hash's digest discipline), conversion =
    "14 or more purchase events" (every fixture user has ≥1 purchase, so
    a has-any metric would be degenerate at rate 1.0), output = per-arm
    counts, lift, and the pooled two-proportion z statistic.

    The event table reduces to per-user bits in one groupBy (map-side
    combined), then two tiny reduces; every z-statistic input is an exact
    integer, so both engines run the identical IEEE expression tree and
    the 4-decimal rounding is stable (the ADVICE r4 centroid lesson:
    never hash-compare an order-dependent float sum)."""
    e = load_table(spark, sf_dir, "events")
    u = (
        e.withColumn("arm", F.col("user_id") % 2)
        .groupBy("user_id", "arm")
        .agg(
            (
                F.sum((F.col("event_type") == "purchase").cast("int")) >= 14
            ).cast("int").alias("conv")
        )
    )
    a = u.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("conv").alias("c")
    )
    wide = a.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("c"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("c"))).alias("conv_b"),
    )
    rate_a = F.col("conv_a") / F.col("n_a")
    rate_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pool * (F.lit(1) - pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(rate_b - rate_a, 6).alias("lift"),
        F.round((rate_b - rate_a) / se, 4).alias("z"),
    )
