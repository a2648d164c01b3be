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
    entries. The round-6 window is named explicitly in
    registry._WINDOW_PREFIX: the repo's one driver-red row
    (q_text_inverted_index, output shape fixed), the 18 round-5
    post-freeze additions that have never been driver-verified, the 4
    round-6 additions registered before this round's freeze, and 27 of
    the 32 stalest (round-1-verified) greens — see the registry comment
    for the derivation. Nothing registered after the freeze may enter
    the window this round (VERDICT r5 item 3).
    Every prefix name must actually be registered — a typo there would
    silently eject a query from verification — and the exposed order
    must start with exactly that prefix."""
    from spring_and_kafka_spark import registry

    specs = registry.all_specs()
    assert len(registry._WINDOW_PREFIX) == 50
    missing = [n for n in registry._WINDOW_PREFIX if n not in specs]
    assert not missing, f"window prefix names not registered: {missing}"
    assert list(specs)[:50] == registry._WINDOW_PREFIX
