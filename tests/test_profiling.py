"""Semantic invariants for the governance-profiling family (beyond the
oracle parity every query already gets in test_oracle_parity.py): the
properties a CONSUMER of these diagnostics relies on — monotone skew
curves, the sketch's designed error bound, the MAD threshold's
robustness guarantee — hold on the fixture data."""

from __future__ import annotations

from spring_and_kafka_spark.llm.text import q_text_inverted_index
from spring_and_kafka_spark.operators.profiling import (
    q_ab_test,
    q_heavy_hitters,
    q_kanon,
    q_profile,
)
from spring_and_kafka_spark.operators.sketches import q_agg_quantile_sketch
from spring_and_kafka_spark.operators.timeseries import q_ts_mad

from .conftest import SF_SMOKE


def test_heavy_hitters_curve_is_monotone_and_bounded(spark):
    rows = sorted(
        q_heavy_hitters(spark, SF_SMOKE).collect(), key=lambda r: r.rnk
    )
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    # counts non-increasing along the ranking; shares in (0, 1]
    for a, b in zip(rows, rows[1:]):
        assert a.cnt >= b.cnt
        assert b.cum_share >= a.cum_share
    assert all(0 < r.share <= 1 for r in rows)
    # cum_share at rank k ≈ sum of shares 1..k (rounding slack only)
    approx = sum(r.share for r in rows)
    assert abs(rows[-1].cum_share - approx) < 1e-4


def test_kanon_accounting_is_consistent(spark):
    row = q_kanon(spark, SF_SMOKE).collect()[0]
    assert row.k == 5
    assert 0 <= row.n_small_groups <= row.n_groups
    # every small group has at most k-1 members
    assert row.n_rows_at_risk <= row.n_small_groups * (row.k - 1)
    assert 0.0 <= row.frac_at_risk <= 1.0


def test_quantile_sketch_error_within_design_bound(spark):
    rows = q_agg_quantile_sketch(spark, SF_SMOKE).collect()
    assert sorted(r.q for r in rows) == [0.5, 0.9, 0.99]
    # two-leading-digit buckets: midpoint is within ±5% of anything in
    # the bucket, and the exact rank answer lives in the chosen bucket
    for r in rows:
        assert r.rel_err <= 0.05, (r.q, r.rel_err)
        assert r.exact_price > 0


def test_mad_threshold_flags_minority(spark):
    rows = q_ts_mad(spark, SF_SMOKE).collect()
    assert rows, "expected per-event-type output"
    for r in rows:
        # MAD cut can never flag the majority (median is inside the cut)
        assert r.n_outliers <= r.n // 2
        assert r.mad_micros >= 0


def test_ab_test_arms_partition_users(spark):
    row = q_ab_test(spark, SF_SMOKE).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert 0 <= row.conv_a <= row.n_a
    assert 0 <= row.conv_b <= row.n_b
    # z and lift agree in sign (or both zero)
    assert (row.z > 0) == (row.lift > 0) or row.lift == 0


def test_profile_covers_every_column_once(spark):
    rows = q_profile(spark, SF_SMOKE).collect()
    names = sorted(r.col_name for r in rows)
    assert names == sorted(
        ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    n_rows = {r.n_rows for r in rows}
    assert len(n_rows) == 1  # every column profiled over the same scan
    for r in rows:
        assert 0 <= r.n_nulls <= r.n_rows
        assert 1 <= r.n_distinct <= r.n_rows


def test_inverted_index_postings_are_impact_ordered(spark):
    rows = q_text_inverted_index(spark, SF_SMOKE).collect()
    assert rows, "head vocabulary should be non-empty"
    for r in rows:
        assert r.df >= 50
        # top_docs is a CSV string (scalar-output contract — the driver
        # hasher cannot factorize list cells; see q_agg_collect)
        docs = r.top_docs.split(",")
        assert 1 <= len(docs) <= 5
        assert all(d.strip().isdigit() for d in docs)
        assert len(set(docs)) == len(docs)
        assert r.tf_total >= r.df  # every posting has tf ≥ 1
