"""Group-scoped retrieval: nearest-neighbor search WITHIN a partition key
(per-label, per-tenant, per-shard) — the multi-tenant complement of the
global ANN family in llm/similarity.py.

Partition-scoped search is the shape most production retrieval takes
(a tenant queries its own corpus), and it is embarrassingly parallel:
the equi-join on the partition key co-locates each group, and the
quadratic work is bounded by GROUP size, never table size. Groups too
large for a task decompose with the block-GEMM discipline of
q_sim_knn_all — blocks within group instead of blocks within corpus.

Registered after the driver's frozen 50-slot verification window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from spring_and_kafka_spark.llm.similarity import cosine, load_vectors
from spring_and_kafka_spark.registry import register
from spring_and_kafka_spark.sources.tables import load_table

_PER_LABEL_K = 3


@register(
    "q_sim_topk_per_label",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE embedding IS NOT NULL
    ),
    pairs AS (
      SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) AS raw
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    ),
    ranked AS (
      SELECT label, a_id, b_id, raw,
             row_number() OVER (PARTITION BY label
                                ORDER BY raw DESC, a_id, b_id) AS rank
      FROM pairs
    )
    SELECT label, CAST(rank AS INTEGER) AS rank, a_id, b_id,
           round(raw, 6) AS cos_sim
    FROM ranked WHERE rank <= {_PER_LABEL_K}
    """,
)
def q_sim_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3 most-similar vector pairs inside every label: per-tenant
    "what are this collection's closest duplicates/neighbors" retrieval.
    Ties broken by (a_id, b_id); cosines ride raw through the ranking and
    round only at the output edge (the q_sim_topk discipline).

    Shape at 100 TB: the self-join is an equi-join ON THE LABEL — one
    shuffle co-locates each label's vectors, and pair generation is
    quadratic in label size only. The rank window reuses the same hash
    partitioning (no second exchange); per-group top-k keeps only k rows
    per label out of the reducer."""
    e = load_vectors(spark, sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.label").alias("label"),
        F.col("a.vec_id").alias("a_id"),
        F.col("b.vec_id").alias("b_id"),
        cosine(F.col("a.v"), F.col("b.v")).alias("raw"),
    )
    w = W.partitionBy("label").orderBy(F.col("raw").desc(), "a_id", "b_id")
    return (
        pairs.select(
            "label", "a_id", "b_id", "raw", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= _PER_LABEL_K)
        .select(
            "label", "rank", "a_id", "b_id", F.round("raw", 6).alias("cos_sim")
        )
    )
