"""Curation-pipeline integration: the planted perturbed copies must be the
docs that get removed, and the survivors must be exactly the
quality-passing originals."""

from __future__ import annotations

from pyspark.sql import functions as F

from spring_and_kafka_spark.llm.pipeline import q_pipeline_curate
from spring_and_kafka_spark.sources.tables import load_table

from .conftest import SF_CORRECT, SF_SMOKE


def test_pipeline_removes_planted_keeps_originals(spark):
    out = q_pipeline_curate(spark, SF_SMOKE).collect()
    total_docs = sum(r["n_docs"] for r in out)

    # independent expectation: quality-passing ORIGINALS (every planted
    # copy is a near-dup of its original and must be removed)
    d = load_table(spark, SF_SMOKE, "documents")
    toks = F.split("text", " ")
    quality_pass = d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        (
            F.size(F.filter(toks, lambda t: t.isin("a", "the")))
            / F.size(toks).cast("double")
        ).alias("stop_ratio"),
    ).filter((F.col("n_toks") >= 30) & (F.col("stop_ratio") <= 0.2))
    expected = quality_pass.count()

    assert 0 < total_docs <= 500  # no perturbed (id+100000) doc survives
    # survivors = quality-passing originals MINUS organic near-dups among
    # the originals themselves (the 31-token vocabulary makes some distinct
    # docs ≥0.6 Jaccard — q_dedup_ngram finds ~100 such pairs beyond the
    # 500 planted ones at sf0.001), so survivors is bounded by `expected`
    # but a little below it
    assert total_docs <= expected
    assert expected - total_docs < 50  # organic-dup removals stay bounded
    assert {r["lang"] for r in out} <= {"de", "en", "es", "fr", "zh"}


import pytest


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT])
def test_pipeline_lsh_candidates_cover_exact_pairs(spark, sf_dir):
    """The hash-match argument for q_pipeline_curate rests on LSH candidate
    recall being 1.0 over the exact J≥0.6 pairs of the quality-filtered
    corpus — assert exactly that (the 16×2 banding's job) at BOTH the
    smoke SF and the driver's verification SF (sf0.01)."""
    from spring_and_kafka_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        planted_corpus,
        shingles,
    )
    from spring_and_kafka_spark.llm.pipeline import (
        _PIPE_BANDS,
        _PIPE_JACCARD,
        _PIPE_ROWS_PER_BAND,
    )

    corpus = planted_corpus(spark, sf_dir)
    toks = F.split("text", " ")
    kept = (
        corpus.select(
            "doc_id",
            "text",
            F.size(toks).alias("n_toks"),
            (
                F.size(F.filter(toks, lambda t: t.isin("a", "the")))
                / F.size(toks).cast("double")
            ).alias("stop_ratio"),
        )
        .filter((F.col("n_toks") >= 30) & (F.col("stop_ratio") <= 0.2))
        .select("doc_id", "text")
    )
    exact = {
        (r["a_id"], r["b_id"])
        for r in ngram_jaccard_pairs(kept, 3, _PIPE_JACCARD).collect()
    }
    cand = {
        (r["a_id"], r["b_id"])
        for r in lsh_candidate_pairs(
            minhash_signatures(shingles(kept, 3)), _PIPE_BANDS, _PIPE_ROWS_PER_BAND
        ).collect()
    }
    assert exact, "fixture must contain true pairs"
    missed = exact - cand
    assert not missed, f"LSH candidates missed {len(missed)} exact pairs"
