"""Dedup operator tests: planted near-duplicates must be recovered
(SURVEY.md §7 hard parts: LSH is probabilistic → fixed seeds + planted
positives)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spring_and_kafka_spark.llm.dedup import (
    q_dedup_embed,
    q_dedup_near,
    q_dedup_ngram,
    q_dedup_simhash,
)

from .conftest import SF_SMOKE


def planted_pairs(rows, a="a_id", b="b_id"):
    """Pairs linking doc X to its perturbed copy X+100000."""
    return {(r[a], r[b]) for r in rows if r[b] == r[a] + 100000}


def test_ngram_truth_finds_planted(spark):
    rows = q_dedup_ngram(spark, SF_SMOKE).collect()
    planted = planted_pairs(rows)
    # every perturbed doc differs by one trailing token → jaccard near 1
    assert len(planted) >= 450  # ≥90% of 500 docs
    for r in rows:
        assert 0.6 <= r["jaccard"] <= 1.0


def test_minhash_lsh_recall_vs_exact(spark):
    truth = planted_pairs(q_dedup_ngram(spark, SF_SMOKE).collect())
    lsh = planted_pairs(q_dedup_near(spark, SF_SMOKE).collect())
    recall = len(lsh & truth) / len(truth)
    assert recall >= 0.8, f"MinHash-LSH recall {recall:.2f} too low"


def test_simhash_finds_planted(spark):
    rows = q_dedup_simhash(spark, SF_SMOKE).collect()
    planted = planted_pairs(rows)
    assert len(planted) >= 300  # simhash is the coarsest sketch
    for r in rows:
        assert r["hamming"] <= 3


def test_clusters_unite_planted_pairs(spark):
    from spring_and_kafka_spark.llm.dedup import q_dedup_clusters

    comp = {
        r["doc_id"]: r["component"]
        for r in q_dedup_clusters(spark, SF_SMOKE).collect()
    }
    assert len(comp) == 1000  # every corpus doc labeled
    for orig in range(500):
        copy = orig + 100000
        # each planted copy is in the same component as its original,
        # and the representative is never the copy itself
        assert comp[copy] == comp[orig]
        assert comp[copy] <= orig
    # components are canonical: every representative labels itself
    for doc, c in comp.items():
        assert comp[c] == c


def test_embed_neardup_exactly_planted(spark):
    rows = q_dedup_embed(spark, SF_SMOKE).collect()
    pairs = {(r["a_id"], r["b_id"]) for r in rows}
    # scaled copies are cos≈1; fixture max non-planted cos is ~0.51 →
    # the result must be exactly the 500 planted pairs
    assert pairs == {(i, i + 100000) for i in range(500)}
    assert all(r["cos_sim"] >= 0.999 for r in rows)
