"""Rigor for the rows-only queries (no DuckDB oracle): every one must be
deterministic across runs, and the approximate aggregates must sit within
their error bounds of the exact answers."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spring_and_kafka_spark import registry
from spring_and_kafka_spark.sources.tables import load_table

from .conftest import SF_CORRECT, SF_SMOKE

ROWS_ONLY = sorted(
    name for name, s in registry.all_specs().items() if s.oracle is None
)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_is_deterministic(name, spark):
    spec = registry.all_specs()[name]
    a = {tuple(map(str, r)) for r in spec.fn(spark, SF_SMOKE).collect()}
    b = {tuple(map(str, r)) for r in spec.fn(spark, SF_SMOKE).collect()}
    assert a == b
    assert len(a) > 0


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT])
def test_approx_count_distinct_within_bound(spark, sf_dir):
    # pinned at the driver's verification SF too: the oracle asserts
    # within_tol=true as a constant, so the HLL estimate must actually
    # sit inside ±5% on the exact fixtures the driver hashes
    e = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = registry.all_specs()["q_agg_approx"].fn(spark, sf_dir).collect()
    got = {r["event_type"]: r for r in rows}
    assert set(got) == set(exact)
    for k, n in exact.items():
        # the query now asserts the tolerance itself and exposes it as a
        # hash-verifiable boolean; exact_users must be genuinely exact
        assert got[k]["exact_users"] == n
        assert got[k]["within_tol"] is True, (k, n)
