"""Similarity-search tests: ANN recall vs brute-force ground truth."""

from __future__ import annotations

from spring_and_kafka_spark.llm.similarity import (
    auto_block_count,
    q_sim_ann_ivf,
    q_sim_knn_all,
    q_sim_topk,
)

from .conftest import SF_SMOKE


def test_topk_is_sorted_and_unique(spark):
    rows = q_sim_topk(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert len({r["vec_id"] for r in rows}) == 10
    assert all(r["vec_id"] != 0 for r in rows)


def test_auto_block_count_scales_with_input():
    """B is derived from the corpus size (bounded per-block memory), not
    pinned: bigger inputs must pick more blocks, and block size stays
    ~rows_per_block so the per-group GEMM never grows with n."""
    small, large = auto_block_count(1_000), auto_block_count(1_000_000)
    assert small < large
    assert auto_block_count(500) == 2  # floor: need >=2 for a pair split
    assert 1_000_000 / auto_block_count(1_000_000) <= 2000  # bounded block


def test_knn_all_shape_and_consistency(spark):
    rows = q_sim_knn_all(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert len(by_q) == 500  # every vector got neighbors
    for qid, rs in by_q.items():
        assert sorted(r["rn"] for r in rs) == [1, 2, 3]
        sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["rn"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["nid"] != qid for r in rs)  # no self-neighbor
    # kNN(vec 0) must agree with the single-query brute force operator
    single = [r["vec_id"] for r in q_sim_topk(spark, SF_SMOKE).collect()][:3]
    batch = [r["nid"] for r in sorted(by_q[0], key=lambda r: r["rn"])]
    assert batch == single


def test_ivf_recall_vs_brute_force(spark):
    truth = {r["vec_id"] for r in q_sim_topk(spark, SF_SMOKE).collect()}
    approx = {r["vec_id"] for r in q_sim_ann_ivf(spark, SF_SMOKE).collect()}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"IVF recall {recall:.2f} (probing 4/16 clusters)"


def test_ivf_refined_recall_floor_and_determinism(spark):
    # On uniform random fixtures Lloyd refinement does not reliably beat
    # the seeded centroids (clusters are meaningless in uniform data; at
    # sf0.01 refined measures 9/10 vs plain 10/10) — so the contract is a
    # recall floor plus deterministic training, not dominance.
    from spring_and_kafka_spark.llm.similarity import q_sim_ann_ivf_refined

    truth = {r["vec_id"] for r in q_sim_topk(spark, SF_SMOKE).collect()}
    a = q_sim_ann_ivf_refined(spark, SF_SMOKE).collect()
    b = q_sim_ann_ivf_refined(spark, SF_SMOKE).collect()
    assert [tuple(map(str, r)) for r in a] == [tuple(map(str, r)) for r in b]
    recall = len({r["vec_id"] for r in a} & truth) / len(truth)
    assert recall >= 0.7, f"refined IVF recall {recall:.2f}"
