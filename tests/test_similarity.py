"""Similarity-search tests: ANN recall vs brute-force ground truth."""

from __future__ import annotations

from spring_and_kafka_spark.llm.similarity import q_sim_ann_ivf, q_sim_topk

from .conftest import SF_SMOKE


def test_topk_is_sorted_and_unique(spark):
    rows = q_sim_topk(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert len({r["vec_id"] for r in rows}) == 10
    assert all(r["vec_id"] != 0 for r in rows)


def test_ivf_recall_vs_brute_force(spark):
    truth = {r["vec_id"] for r in q_sim_topk(spark, SF_SMOKE).collect()}
    approx = {r["vec_id"] for r in q_sim_ann_ivf(spark, SF_SMOKE).collect()}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"IVF recall {recall:.2f} (probing 4/16 clusters)"
