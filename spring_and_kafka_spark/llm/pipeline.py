"""End-to-end training-data curation pipeline (SURVEY.md §2.10 composed):
the flagship composition showing the LLM-data operators working together —
quality filtering → near-duplicate removal → per-language corpus budget.

Every stage is the declarative form of an operator that exists standalone
elsewhere in llm/ (quality features, n-gram Jaccard dedup, corpus stats),
so the whole pipeline stays SQL-expressible and gets a full DuckDB
hash-match oracle — an integration check, not just unit parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spring_and_kafka_spark.llm.dedup import planted_corpus, shingles
from spring_and_kafka_spark.registry import register
from spring_and_kafka_spark.sources.tables import load_table


@register(
    "q_pipeline_curate",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, regexp_replace(text, '\\s+\\S+$', '')
      FROM documents
    ),
    quality AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS n_toks,
             len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the')))
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio
      FROM corpus
    ),
    kept AS (
      SELECT doc_id, text, n_toks FROM quality
      WHERE n_toks >= 30 AND stop_ratio <= 0.2
    ),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(greatest(len(string_split(text, ' ')) - 2, 1)),
                 i -> array_to_string(string_split(text, ' ')[i + 1 : i + 3], ' ')
               )) AS shingle
        FROM kept
      )
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    dup AS (
      SELECT c.a_id, c.b_id
      FROM (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) c
      JOIN sizes sa ON sa.doc_id = c.a_id
      JOIN sizes sb ON sb.doc_id = c.b_id
      WHERE c.c / (sa.n + sb.n - c.c) >= 0.6
    ),
    survivors AS (
      SELECT k.doc_id, k.n_toks FROM kept k
      WHERE k.doc_id NOT IN (SELECT b_id FROM dup)
    ),
    tagged AS (
      SELECT s.doc_id, s.n_toks,
             d.lang
      FROM survivors s
      JOIN documents d ON d.doc_id = s.doc_id % 100000
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens,
           round(avg(n_toks), 4) AS avg_tokens
    FROM tagged GROUP BY lang
    """,
)
def q_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curate a corpus end-to-end: (1) quality-filter (≥30 tokens, stopword
    ratio ≤0.2), (2) remove near-duplicates (exact 3-gram Jaccard ≥0.6,
    keep the lower doc_id — drops the planted perturbed copies), (3) report
    the surviving token budget per language.

    Stage shapes at 100 TB: quality is a scan-only projection; dedup is the
    documented exact path (swap in MinHash-LSH from llm/dedup.py at scale);
    the final stats are one small groupBy. The dedup removal is an
    anti-join on the higher-id side of each duplicate pair."""
    corpus = planted_corpus(spark, sf_dir)
    toks = F.split("text", " ")
    quality = corpus.select(
        "doc_id",
        "text",
        F.size(toks).alias("n_toks"),
        (
            F.size(F.filter(toks, lambda t: t.isin("a", "the")))
            / F.size(toks).cast("double")
        ).alias("stop_ratio"),
    )
    kept = quality.filter(
        (F.col("n_toks") >= 30) & (F.col("stop_ratio") <= 0.2)
    ).select("doc_id", "text", "n_toks")

    # three consumers of sh → materialize once (see q_dedup_ngram)
    sh = shingles(kept, 3).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    dup_victims = (
        common.join(F.broadcast(sa), "a_id")
        .join(F.broadcast(sb), "b_id")
        .filter(jac >= 0.6)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    survivors = kept.join(dup_victims, "doc_id", "left_anti")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    tagged = survivors.withColumn("orig_id", F.col("doc_id") % 100000).join(
        F.broadcast(docs.withColumnRenamed("doc_id", "orig_id")), "orig_id"
    )
    return tagged.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.round(F.avg("n_toks"), 4).alias("avg_tokens"),
    )
