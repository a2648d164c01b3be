"""Graph analytics over relational data: integer-exact PageRank on the
part co-purchase graph.

The dedup family already covers the other canonical iterative graph op
(connected components, llm/dedup.py); this module adds the ranked-
importance side. Both follow the same iterative discipline: per-round
`materialize` to cut lineage, driver holds only loop COUNTERS, never data.

Why integer arithmetic: a float PageRank can never hash-match across
engines — per-node sums run in engine-specific order and float addition
is not associative. Scaling ranks to integers (1e6 = mass 1.0) makes
every operation exact and order-free: contribution = rank div outdeg,
damping = 150000 + (85 * inflow) div 100. The truncation drift vs the
real-valued recurrence is < 1e-6 per edge per round — irrelevant for
ranking — and the DuckDB oracle replays the identical integer recurrence,
so the hash check is exact, not approximate.

Imported late in registry._load_all_modules — registers AFTER the
driver's frozen 50-slot verification window prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spring_and_kafka_spark.exec_utils import materialize
from spring_and_kafka_spark.registry import register
from spring_and_kafka_spark.sources.tables import load_table

_PR_ITERS = 5
_PR_SCALE = 1_000_000  # rank 1.0 == 1e6
_PR_BASE = 150_000  # (1 - d) * scale, d = 0.85


def _pr_iter_sql(k: int) -> str:
    return f"""
    r{k} AS (
      SELECT n.node,
             CAST({_PR_BASE} + (85 * coalesce(s.m, 0)) // 100 AS BIGINT)
               AS pr
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(r.pr // d.deg) AS BIGINT) AS m
        FROM edges e
        JOIN r{k - 1} r ON e.src = r.node
        JOIN outdeg d ON d.src = e.src
        GROUP BY e.dst
      ) s ON n.node = s.node
    )"""


@register(
    "q_graph_pagerank",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT l_partkey AS node FROM li),
    r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS pr FROM nodes),
    {",".join(_pr_iter_sql(k) for k in range(1, _PR_ITERS + 1))}
    SELECT node, pr FROM r{_PR_ITERS}
    """,
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 rounds) over the part co-purchase graph:
    directed edges between every pair of parts that appear in the same
    order. The "what else matters" centrality query every recommender
    or catalog-importance pipeline runs.

    All arithmetic is scaled-integer (see module doc) so both engines
    hold bit-identical BIGINTs after every round; the oracle unrolls the
    same 5 rounds as chained CTEs — the same treatment that made the
    Lloyd-refined IVF index SQL-oracled.

    Shape at 100 TB: edge construction is a self-join co-partitioned on
    l_orderkey (per-order fanout is quadratic in ORDER SIZE, which is
    bounded by 7 in TPC-H — never in table size). Edges and out-degrees
    are materialized ONCE and reused every round instead of recomputing
    the self-join 5 times inside one unrolled plan. Each round is one
    shuffled join on src (edges re-use their partitioning) plus one
    map-side-combined groupBy(dst); per-round `materialize` cuts lineage
    so the plan never deepens — the connected-components discipline.
    The driver holds no data, only the loop index."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = materialize(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = li.select(F.col("l_partkey").alias("node")).distinct()
    ranks = nodes.select(
        "node", F.lit(_PR_SCALE).cast("long").alias("pr")
    )
    for _ in range(_PR_ITERS):
        inflow = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outdeg, "src")
            .select("dst", F.expr("pr div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").cast("long").alias("m"))
        )
        ranks = materialize(
            nodes.join(inflow, nodes.node == inflow.dst, "left").select(
                "node",
                (
                    F.lit(_PR_BASE)
                    + F.expr("85 * coalesce(m, 0) div 100")
                )
                .cast("long")
                .alias("pr"),
            )
        )
    return ranks
