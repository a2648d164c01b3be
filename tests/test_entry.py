"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 70
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_queries_are_callables():
    q = entrymod.queries()
    assert all(callable(f) for f in q.values())


def test_verification_window_prefix_is_frozen():
    """The driver hash-verifies EXACTLY the first 50 exposed registry
    entries. The round-5 window is named explicitly in
    registry._WINDOW_PREFIX, and ALL 50 slots are first-time
    verifications: the 6 round-4 additions that registered past the r4
    window, the 32 earlier round-5 additions, and the 12 late round-5
    governance/warehouse additions (which displaced the originally
    planned round-1 re-verification backfill; see the registry comment
    for the derivation). Post-freeze round-5 additions rank after the
    prefix and wait for the round-6 rotation.
    Every prefix name must actually be registered — a typo there would
    silently eject a query from verification — and the exposed order
    must start with exactly that prefix."""
    from spring_and_kafka_spark import registry

    specs = registry.all_specs()
    assert len(registry._WINDOW_PREFIX) == 50
    missing = [n for n in registry._WINDOW_PREFIX if n not in specs]
    assert not missing, f"window prefix names not registered: {missing}"
    assert list(specs)[:50] == registry._WINDOW_PREFIX
