"""Rigor for the claim-backed queries — the ones whose DuckDB oracles
assert a CONSTANT (est_ok / within_tol / within_ci = true) because the
underlying quantity is engine-specific (RNG, sketch estimates).

Those constants are empirical fixture properties, not guarantees
(ADVICE r2 #2), so each is pinned here at every SF the driver's
correctness gate can run — SF_SMOKE and SF_CORRECT. Fixture regeneration
or a hash-realization change MUST re-pass these before the constant-true
oracles can be trusted again. (Since round 3 the registry has zero
rows-only entries: q_dedup_simhash and q_sim_lsh_bucket gained full
replay oracles, q_sample_seeded a concentration claim.)
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spring_and_kafka_spark import registry
from spring_and_kafka_spark.sources.tables import load_table

from .conftest import SF_CORRECT, SF_SMOKE

# Queries whose oracle embeds a constant-true claim column.
CLAIM_QUERIES = {
    "q_agg_approx": "within_tol",
    "q_agg_hll_rollup": "within_tol",
    "q_dedup_near": "est_ok",
    "q_sample_seeded": "within_ci",
}


def test_registry_has_no_rows_only_entries():
    # the driver records oracle-less queries as err=no_oracle (non-green);
    # guard against regressing a query back to rows-only silently
    missing = [n for n, s in registry.all_specs().items() if s.oracle is None]
    assert missing == []


@pytest.mark.parametrize("name", sorted(CLAIM_QUERIES))
def test_claim_query_is_deterministic(name, spark):
    spec = registry.all_specs()[name]
    a = {tuple(map(str, r)) for r in spec.fn(spark, SF_SMOKE).collect()}
    b = {tuple(map(str, r)) for r in spec.fn(spark, SF_SMOKE).collect()}
    assert a == b
    assert len(a) > 0


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT])
@pytest.mark.parametrize("name", sorted(CLAIM_QUERIES))
def test_claim_holds_on_driver_fixtures(name, sf_dir, spark):
    # the pinned-SF lockstep: every claim column must be uniformly true on
    # the exact fixtures the driver hashes
    col = CLAIM_QUERIES[name]
    rows = registry.all_specs()[name].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r[col] is True for r in rows), f"{name}.{col} violated at {sf_dir}"


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
