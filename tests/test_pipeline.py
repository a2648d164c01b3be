"""Curation-pipeline integration: the planted perturbed copies must be the
docs that get removed, and the survivors must be exactly the
quality-passing originals."""

from __future__ import annotations

from pyspark.sql import functions as F

from spring_and_kafka_spark.llm.pipeline import q_pipeline_curate
from spring_and_kafka_spark.sources.tables import load_table

from spring_and_kafka_spark import registry

from .conftest import SF_CORRECT, SF_SMOKE

SPECS = registry.all_specs()


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


def test_temperature_sampling_invariants(spark):
    """Rarest language keeps everything (rate exactly 1.0); every rate in
    (0, 1]; kept <= total per language — at BOTH driver scale factors."""
    for sf in (SF_SMOKE, SF_CORRECT):
        rows = SPECS["q_sample_temperature"].fn(spark, sf).collect()
        rarest = min(rows, key=lambda r: r["n_docs"])
        assert rarest["accept_rate"] == 1.0
        assert rarest["n_kept"] == rarest["n_docs"]
        for r in rows:
            assert 0.0 < r["accept_rate"] <= 1.0
            assert 0 <= r["n_kept"] <= r["n_docs"]


def test_chunking_tiles_every_document(spark):
    """Chunks start at 0, advance by exactly one stride, stay within
    [1, CHUNK] tokens, and the final chunk ends at the document's last
    token — full coverage, no over-run."""
    from collections import defaultdict

    from spring_and_kafka_spark.llm.text import _CHUNK, _STRIDE

    rows = SPECS["q_text_chunk"].fn(spark, SF_SMOKE).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    n_toks = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .selectExpr("doc_id", "size(split(text, ' ')) AS n")
        .collect()
    }
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert chunks[0]["start_tok"] == 0
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i
            assert c["start_tok"] == i * _STRIDE
            assert 1 <= c["n_toks"] <= _CHUNK
        last = chunks[-1]
        assert last["start_tok"] + last["n_toks"] == n_toks[doc_id]


def test_decontaminate_consistent_with_corpus_split(spark):
    """Per-language train counts agree with q_corpus_split's train rows,
    and contaminated + kept partition the train set exactly."""
    decon = {r["lang"]: r for r in SPECS["q_decontaminate"].fn(spark, SF_SMOKE).collect()}
    split = {
        (r["lang"], r["split"]): r["n_docs"]
        for r in SPECS["q_corpus_split"].fn(spark, SF_SMOKE).collect()
    }
    for lang, r in decon.items():
        assert r["n_train"] == split[(lang, "train")]
        assert r["n_contaminated"] + r["n_kept"] == r["n_train"]
        assert r["n_kept"] > 0


def test_corpus_repeat_bounded_by_epoch_floor_ceil(spark):
    """Per language: emitted rows lie between floor(epochs)*n_docs and
    ceil(epochs)*n_docs, and token output follows the same bound — the
    fractional coin only ever adds 0 or 1 extra copy per doc."""
    import math

    mix = {r["lang"]: r for r in SPECS["q_corpus_mix"].fn(spark, SF_SMOKE).collect()}
    docs = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    out = {r["lang"]: r for r in SPECS["q_corpus_repeat"].fn(spark, SF_SMOKE).collect()}
    for lang, r in out.items():
        epochs = mix[lang]["target_toks"] / mix[lang]["n_toks"]
        lo = math.floor(epochs) * docs[lang]
        hi = math.ceil(epochs) * docs[lang]
        assert lo <= r["n_rows_out"] <= hi
        assert r["n_docs_emitted"] <= docs[lang]
