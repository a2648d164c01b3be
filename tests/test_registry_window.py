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
from tools.window_pool import histogram, last_verified, pool

# The nine queries whose oracle SQL / guards changed in round 9 while
# outside the r9 window — rotation rule: changed output leads the next
# window (ADVICE r9 item 3 made this binding).
CHANGED_R9_UNWINDOWED = [
    "q_dist_shift",
    "q_fn_string",
    "q_ts_simsearch",
    "q_win_ntile",
    "q_win_dist",
    "q_win_streak",
    "q_embed_dim_stats",
    "q_fn_array",
    "q_udf_scalar",
]


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


def test_window_pool_histogram_matches_committed_artifacts():
    """Pin tools.window_pool against CORRECTNESS_r01..r09 (VERDICT r9
    item 2): the hand-counted registry comments were wrong in r7, r8
    and r9; the rotation input is now this derived histogram."""
    lv = last_verified()
    assert len(lv) == 226
    assert 0 not in lv.values(), "never-verified rows reappeared"
    assert histogram(lv) == {4: 46, 5: 42, 6: 44, 8: 44, 9: 50}


def test_r10_window_is_changed_nine_plus_r10_fix_plus_r4_pool():
    """The r10 window must be exactly: the nine r9-changed unwindowed
    queries, then q_hist_equiwidth (output changed IN r10 — the
    NULL-bucket fix the property battery forced), then 40 r4-stale rows
    in tools.window_pool pool() order (stalest round, then name) — i.e.
    the window is DERIVED, not hand-picked."""
    prefix = registry._WINDOW_PREFIX
    assert prefix[:9] == CHANGED_R9_UNWINDOWED
    assert prefix[9] == "q_hist_equiwidth"
    lv = last_verified()
    r4_pool = [
        n
        for n in pool(lv)
        if lv[n] == 4 and n not in CHANGED_R9_UNWINDOWED
    ]
    assert prefix[10:] == r4_pool[:40]
    # the five r4 rows that don't fit lead the r11 pool
    assert r4_pool[40:] == [
        "q_tpch_q9",
        "q_ts_anomaly",
        "q_ts_ewma",
        "q_ts_resample",
        "q_win_running_distinct",
    ]
