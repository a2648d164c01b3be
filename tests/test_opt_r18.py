"""Round-18 optimization equivalence pins (the test_opt_r17 convention:
new form vs a locally re-built reference of the old form, on fixture
data, so a future edit cannot silently diverge them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spring_and_kafka_spark.llm.dedup import (
    _band_bucket_rows,
    _band_structs,
    _doc_features,
    planted_corpus,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_band_structs_symmetric_incremental_agree(spark):
    # ADVICE r17: the banding expression is extracted into _band_structs
    # so lsh_candidate_pairs (symmetric) and _band_bucket_rows
    # (incremental) derive IDENTICAL buckets from the same signatures.
    # Pin it end to end: the symmetric path's exploded bucket rows must
    # equal the incremental path's materialized bucket table (cap lifted
    # so neither side filters).
    sig = _doc_features(planted_corpus(spark, SF), n=3, df_cap=5000).select(
        "doc_id", "mh"
    )
    sym_buckets = sig.select(
        "doc_id", F.explode(_band_structs(16, 2)).alias("bb")
    ).select(
        "doc_id",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    inc_buckets = _band_bucket_rows(sig, 16, 2, bucket_cap=10**9).select(
        "doc_id", "band", "bucket"
    )
    assert _rows(sym_buckets) == _rows(inc_buckets)
