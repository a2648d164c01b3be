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
    """The driver hash-verifies EXACTLY the first 50 registry entries
    (registration order = module import order). Round 3 rotated the 18
    never-verified queries plus freshly-rewritten oracles into that
    prefix; any later registration-order change — a new def above an old
    one, an import reshuffle, a module that transitively imports a
    registering module — would silently eject queries from verification.
    New queries must register AFTER slot 50 (late modules only)."""
    from spring_and_kafka_spark import registry

    expected = [
        "q_dedup_exact", "q_dedup_ngram", "q_dedup_near", "q_dedup_simhash",
        "q_dedup_clusters", "q_dedup_clusters_lsh", "q_dedup_embed",
        "q_dedup_survivors", "q_corpus_budget", "q_sample_stratified_hash",
        "q_text_redact", "q_corpus_pack", "q_embed_quantize",
        "q_stream_tumble", "q_rollup_hier", "q_stream_session",
        "q_fn_string", "q_fn_regex", "q_fn_math", "q_fn_date",
        "q_fn_editdist", "q_fn_condexpr", "q_fn_bits", "q_fn_hash",
        "q_fn_trig", "q_fn_cast", "q_sim_pairwise", "q_sim_topk",
        "q_sim_ann_ivf", "q_sim_knn_all", "q_sim_ann_ivf_refined",
        "q_sim_lsh_bucket", "q_sample_hash", "q_sample_hash_threshold",
        "q_sample_seeded", "q_join_inner", "q_join_broadcast",
        "q_join_left", "q_join_right", "q_join_full", "q_join_semi",
        "q_join_anti", "q_join_cross", "q_join_theta", "q_join_range",
        "q_join_multi", "q_join_asof", "q_agg_approx", "q_agg_collect",
        "q_agg_argmax",
    ]
    assert list(registry.all_specs())[:50] == expected
