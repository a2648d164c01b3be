"""Well-formedness pins for the driver verification window
(registry._WINDOW_PREFIX) — the rotation discipline's mechanical half.
The r8 round skipped rotation entirely and the r6-r7 windows carried a
stale accounting comment; these pins can't force a rotation, but they
guarantee any window that IS shipped is exactly what the driver will
verify: 50 names, no duplicates, every name registered, and the
exposed ordering starting with the prefix byte-for-byte (the driver
hash-checks exactly the first 50 of all_specs())."""

from __future__ import annotations

from spring_and_kafka_spark import registry


def test_window_prefix_is_exactly_50_unique_registered_names():
    prefix = registry._WINDOW_PREFIX
    assert len(prefix) == 50
    assert len(set(prefix)) == 50, "duplicate names in the window"
    specs = registry.all_specs()
    missing = [n for n in prefix if n not in specs]
    assert not missing, f"window names not registered: {missing}"


def test_all_specs_order_starts_with_window_prefix():
    specs = registry.all_specs()
    assert list(specs)[:50] == registry._WINDOW_PREFIX


def test_every_spec_reachable_and_ordering_total():
    # the fallback (module rank, def order) ordering must place every
    # non-window query deterministically: all modules that register
    # queries appear in _MODULE_ORDER
    specs = registry.all_specs()
    unranked = {
        s.module
        for s in specs.values()
        if s.name not in registry._WINDOW_RANK
        and s.module not in registry._MODULE_RANK
    }
    assert not unranked, f"modules missing from _MODULE_ORDER: {unranked}"
