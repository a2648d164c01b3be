"""Product-analytics composites over the event stream: funnel analysis and
cohort retention — the queries an events pipeline exists to answer
(the reference's Spring XD model: "count, filter, enrich or transform",
reference README.md:329, grown to real analytics).

Both reduce the event table to per-user firsts before any join — the
shuffles carry users, never raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from spring_and_kafka_spark.exec_utils import ts_micros
from spring_and_kafka_spark.registry import register
from spring_and_kafka_spark.sources.tables import load_table


@register(
    "q_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t1
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM c) AS n_click_after,
           (SELECT count(*) FROM p) AS n_purchase_after
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase: users counted at each
    stage only if the stage event happens strictly AFTER their previous
    stage's first event. Each stage is a per-user min (tiny) joined to the
    next stage's events — event rows never shuffle twice."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(s), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after")))
    )


@register(
    "q_ts_simsearch",
    oracle="""
    WITH seqs AS (
      SELECT user_id, event_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w
      FROM events
    ),
    scored AS (
      SELECT user_id, event_id,
             list_dot_product(w, w)
             - 2 * list_dot_product(w, [5.0, 10.0, 15.0, 20.0, 15.0, 10.0, 5.0, 0.0])
             + 1100.0 AS d2
      FROM seqs WHERE len(w) = 8
    )
    SELECT user_id, event_id, round(sqrt(d2), 6) AS dist,
           CAST(row_number() OVER (ORDER BY d2, user_id, event_id) AS BIGINT) AS rnk
    FROM scored
    ORDER BY d2, user_id, event_id LIMIT 5
    """,
)
def q_ts_simsearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series subsequence similarity search (cf. PAPERS.md: "Time
    Series Similarity Search for Streaming Data in Distributed Systems",
    EDBT 2019): find the 5 length-8 windows of each user's value series
    closest (Euclidean) to a query pattern.

    Subsequences come from a ROWS window frame (no self-join); distance
    uses the |a|² − 2a·q + |q|² expansion so the pattern dot products are
    the only per-window arithmetic; top-5 via TakeOrderedAndProject."""
    pattern = [5.0, 10.0, 15.0, 20.0, 15.0, 10.0, 5.0, 0.0]
    qq = sum(x * x for x in pattern)  # 1300.0
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.currentRow, 7)
    )
    seqs = e.select(
        "user_id", "event_id", F.collect_list("value").over(w).alias("w")
    ).filter(F.size("w") == 8)
    lit_pattern = F.array(*[F.lit(x) for x in pattern])
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    d2 = (
        dot(F.col("w"), F.col("w"))
        - 2 * dot(F.col("w"), lit_pattern)
        + F.lit(qq)
    )
    scored = seqs.select("user_id", "event_id", d2.alias("d2"))
    ranked = (
        scored.orderBy("d2", "user_id", "event_id")
        .limit(5)
        .select(
            "user_id",
            "event_id",
            F.round(F.sqrt("d2"), 6).alias("dist"),
            F.row_number()
            .over(W.orderBy("d2", "user_id", "event_id"))
            .cast("long")
            .alias("rnk"),
        )
    )
    return ranked


@register(
    "q_retention",
    oracle="""
    WITH weekly AS (
      SELECT DISTINCT user_id,
             CAST(floor(datediff('day', TIMESTAMP '2024-01-01 00:00:00', ts) / 7)
                  AS INT) AS week
      FROM events
    ),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY 1)
    SELECT c.cohort_week,
           CAST(w.week - c.cohort_week AS INT) AS week_offset,
           CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
    FROM weekly w JOIN cohort c ON w.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-active week, counted in
    every later week they return (the classic retention triangle). The
    cohort table is per-user (small) → broadcast onto weekly activity."""
    e = load_table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7
    ).cast("int")
    weekly = e.select("user_id", week.alias("week")).distinct()
    cohort = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(F.broadcast(cohort), "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "q_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_us
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, us,
             CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ),
    numbered AS (
      SELECT user_id, event_id,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS sess_id
      FROM marked
    ),
    per_sess AS (
      SELECT user_id, sess_id, count(*) AS n_events
      FROM numbered GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(max(n_events) AS BIGINT) AS max_session_events
    FROM per_sess GROUP BY user_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a user's events belong to one session
    until a >30-minute silence; report per-user session count, event
    count, and largest session.

    Timestamps compare as exact integer microseconds (unix_micros /
    epoch_us) on both engines — no float epoch seconds, no truncation
    ambiguity. One shuffle on user_id; the lag window, the running
    session-id sum, and both aggregations all reuse that partitioning
    (the (user_id, sess_id) groupBy is a prefix-compatible re-agg, and
    partial aggregation keeps the final per-user rollup map-side). At
    100 TB this is the canonical sessionize shape: no self-join, state
    bounded by one user's events per partition, AQE free to coalesce."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = ts_micros("ts")
    prev = F.lag(us).over(w)
    marked = e.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.when(prev.isNull() | (us - prev > 1_800_000_000), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    # the running sum numbers sessions in the SAME total order the
    # boundaries were computed in — (us, event_id) is unique, so the
    # cumulative sum is deterministic and groups rows to the session
    # opened by the boundary immediately before them
    w2 = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    numbered = marked.select(
        "user_id", "event_id", F.sum("new_sess").over(w2).alias("sess_id")
    )
    per_sess = numbered.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events")
    )
    return per_sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )


@register(
    "q_scd2",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    starts AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM changes
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from, event_id
           ) AS valid_to,
           CAST(lead(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from, event_id
           ) IS NULL AS BOOLEAN) AS is_current
    FROM starts
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: collapse each user's event_type stream
    into validity intervals [valid_from, valid_to) with an is_current
    flag — the warehouse dimension-versioning operator (MERGE-free: the
    whole history derives from one window pass over the change log).

    Consecutive same-type events collapse into one interval (lag-compare
    keeps only change rows); lead() closes each interval with the next
    change's start. One shuffle on user_id; both window passes and the
    filter reuse that partitioning. At 100 TB this is the standard
    changelog→dimension compaction and stays a single exchange."""
    from spring_and_kafka_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    starts = changes.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    ).select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    w2 = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    nxt = F.lead("valid_from").over(w2)
    return starts.select(
        "user_id",
        "event_type",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
