"""Well-formedness pins for the driver verification window
(registry._WINDOW_PREFIX) — the rotation discipline's mechanical half.
The r8 round skipped rotation entirely, the r6-r7 windows carried a
stale accounting comment, and the r10 pins froze an UNBOUNDED glob of
CORRECTNESS_r*.json so the driver depositing the round-10 artifact
broke them by construction (VERDICT r10 item 1). The split now is:

* SNAPSHOT pins call last_verified(through_round=N) with the exact
  artifact set the rotation was derived from — future artifacts cannot
  retroactively change them;
* INVARIANT pins run against the unbounded glob and assert only
  properties that must hold whatever round it is (no never-verified
  rows, prefix well-formed, prefix registered).

These pins can't force a rotation, but they guarantee any window that
IS shipped is exactly what the driver will verify: 50 names, no
duplicates, every name registered, and the exposed ordering starting
with the prefix byte-for-byte (the driver hash-checks exactly the
first 50 of all_specs())."""

from __future__ import annotations

from spring_and_kafka_spark import registry
from tools.window_pool import histogram, last_verified, pool

# Each window's derivation input is CORRECTNESS_r01..r{N-1} — bound
# every snapshot assert to its own input set (VERDICT r10 item 1:
# unbounded pins fail the moment the next round's artifact lands).
R11_DERIVATION_ROUND = 10
R12_DERIVATION_ROUND = 11
R13_DERIVATION_ROUND = 12
R14_DERIVATION_ROUND = 13
R15_DERIVATION_ROUND = 14
R16_DERIVATION_ROUND = 15
R17_DERIVATION_ROUND = 16

# NEW in r11 (never driver-verified — must lead any window they can
# reach, pool() round-0 name order): the r11 LLM-ops batch.
NEW_R11 = [
    "q_embed_cluster_purity",
    "q_langid_confusion",
    "q_text_js_shift",
    "q_text_length_filter",
]

# Changed in r11 while already green: q_hist_equiwidth's oracle gained
# the ORDER BY ... NULLS FIRST pin (ADVICE r10 item 2). Changed text
# follows the never-verified block so the driver executes what ships.
CHANGED_R11 = ["q_hist_equiwidth"]

# NEW in r12: the suite-completing TPC-H adaptations plus the
# CC / outlier / equi-depth / l-diversity batch (pool() round-0 name
# order — '1' sorts before '2', so q11/q12 lead q2).
NEW_R12 = [
    "q_embed_outlier",
    "q_graph_cc",
    "q_hist_equidepth",
    "q_ldiversity",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q2",
    "q_ts_theilsen",
    "q_win_rolling_median",
]

# Changed in r12 while already green: q_embed_cluster_purity's oracle
# gained the NULLIF zero-norm guard + NULLS LAST pin (ADVICE r11).
CHANGED_R12 = ["q_embed_cluster_purity"]

# NEW in r13: IVF recall@k eval, ER candidate scoring, multi-source
# BFS hops, neighborhood Jaccard, k-core peel, log2 length histogram,
# Markov transition matrix, t-closeness audit, script-mix audit,
# seasonal-adjusted MAD, @udtf surface (pool() round-0 name order).
NEW_R13 = [
    "q_embed_recall_eval",
    "q_er_score",
    "q_graph_bfs",
    "q_graph_jaccard",
    "q_graph_kcore",
    "q_hist_log2",
    "q_seq_markov",
    "q_tcloseness",
    "q_text_script_mix",
    "q_ts_stl_residual",
    "q_udf_udtf",
]

# Changed in r13 while already green: q_graph_cc's propagation cadence
# (4 rounds per materialize block — identical output by the fixed-point
# argument, but changed code re-enters the window).
CHANGED_R13 = ["q_graph_cc"]

# NEW in r14: IVF cell-balance audit, NDCG@k sketch-ranking eval, PQ
# distortion/recall eval, RRF fusion, near-dup threshold curve, degree
# assortativity, power-law degree histogram, local clustering
# coefficient, brand-partition modularity, session-bounded Markov
# matrix, sign-sketch Hamming top-k, join-key skew audit, lexical
# diversity, lead/lag cross-correlation, gaps-and-islands streaks
# (pool() round-0 name order).
NEW_R14 = [
    "q_dedup_threshold_curve",
    "q_embed_ivf_balance",
    "q_embed_ndcg_eval",
    "q_embed_pq_eval",
    "q_embed_rrf",
    "q_embed_threshold_curve",
    "q_graph_assortativity",
    "q_graph_degree_dist",
    "q_graph_lcc",
    "q_graph_modularity",
    "q_seq_markov_session",
    "q_sim_hamming_topk",
    "q_skew_audit",
    "q_text_diversity",
    "q_ts_crosscorr",
    "q_user_streak",
]

# Changed in r14 while already green (name order): the NULLIF
# zero-norm pins on the three cosine oracles rotating in (the r13
# rotation backlog), the q_graph_jaccard hub cap (VERDICT r13 item 1),
# and the three ADVICE r13 fixes.
CHANGED_R14 = [
    "q_embed_centroid",
    "q_graph_jaccard",
    "q_hist_log2",
    "q_seq_markov",
    "q_sim_ann_ivf",
    "q_sim_ann_ivf_refined",
    "q_sim_pairwise",
    "q_sim_topk",
    "q_ts_stl_residual",
]

# NEW in r15 (deliberately small — the r14 verdict's rotation-over-
# growth note): MinHash estimator calibration, the Matryoshka
# dimension-truncation recall curve, rank-biased overlap of the sketch
# vs exact rankings, the Gopher rule battery, the two-sample KS
# sampling audit, cross-source template detection, collocation PMI,
# offline change-point detection (pool() round-0 name order).
NEW_R15 = [
    "q_dedup_minhash_est",
    "q_embed_matryoshka_eval",
    "q_embed_rbo",
    "q_quality_gopher",
    "q_sample_ks_check",
    "q_text_boilerplate",
    "q_text_pmi",
    "q_ts_changepoint",
]

# Changed in r15 while already green: q_embed_threshold_curve's sample
# scan joined the _WF_SQL well-formed-vector contract on both sides
# (ADVICE r14 item 1).
CHANGED_R15 = ["q_embed_threshold_curve"]

# NEW in r16 (the r15 verdict's Next-round items 1/3/4 plus two
# family-completing calibration curves; rotation-over-growth again —
# 5 new ops so the window retires ALL 31 remaining r10-stale rows):
# the segment-df threshold-calibration histogram, the per-doc
# span-excision readout, label-propagation communities scored by
# modularity, Hamming-shortlist -> exact-cosine re-rank with truth
# agreement, and its recall-vs-shortlist-length curve (pool() round-0
# name order).
NEW_R16 = [
    "q_dedup_seg_df_hist",
    "q_dedup_substring",
    "q_graph_lpa",
    "q_sim_rerank",
    "q_sim_rerank_curve",
]

# Changed in r16 while already green (name order): q_hist_equidepth
# and q_winsorize moved their percentile boundaries to exact-integer-
# cents interpolation (hypothesis falsified the raw-double form on
# subnormal ties — the engines' interpolation ARITHMETIC differs:
# Spark lo + (hi-lo)*f vs DuckDB lo*(1-f) + hi*f); q_sample_ks_check
# moved to the sample-vs-COMPLEMENT two-sample form (n_pop -> n_rest —
# ADVICE r15 item 1: nested samples deflate D).
CHANGED_R16 = ["q_hist_equidepth", "q_sample_ks_check", "q_winsorize"]

# NEW in r17 (rotation-over-growth: 6 new ops, under the <=10 cap, so
# the window still retires ALL 38 remaining r11-stale rows — the r16
# verdict's item 1): canonical-doc selection per near-dup cluster, the
# arbitrary-offset anchor-ngram span alignment, its per-doc
# interval-union excision readout, the recall-vs-probe-count IVF
# curve, the composed IVF-probe x PQ-rank serving query, and the
# multi-query rerank recall grid (pool() round-0 name order).
NEW_R17 = [
    "q_dedup_keep_best",
    "q_dedup_span_align",
    "q_dedup_span_cover",
    "q_sim_ivf_probe_curve",
    "q_sim_ivfpq_search",
    "q_sim_rerank_grid",
]

# Changed in r17 while already green: q_winsorize's band edges moved
# from engine percentile functions onto exact integer rank
# decomposition (ADVICE r16 item 2 — the r16 cents form still
# double-interpolated, divergent within 1 ulp of a half-cent).
CHANGED_R17 = ["q_winsorize"]


# ---------------------------------------------------------------- invariants


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


def test_no_never_verified_rows_whatever_the_artifact_set():
    """Unbounded on purpose: adding artifacts can only move last-verified
    rounds FORWARD, so these must hold at any future round too. A
    registered query must be driver-green in SOME artifact — except a
    brand-new one, which is allowed exactly as long as it LEADS the
    current window (the driver verifies the first 50, so it gets its
    artifact row the same round it ships)."""
    lv = last_verified()
    assert 0 not in lv.values(), "a query went red in every artifact"
    specs = registry.all_specs()
    unknown = [n for n in lv if n not in specs]
    assert not unknown, f"artifact rows not in the registry: {unknown}"
    pending = [n for n in specs if n not in lv]
    window = set(registry._WINDOW_PREFIX)
    stranded = [n for n in pending if n not in window]
    assert not stranded, (
        f"never-verified queries outside the driver window: {stranded}"
    )


# ---------------------------------------------- snapshots (round-bounded)


def test_window_pool_histograms_match_their_input_rounds():
    """The r10 derivation record (through r9) and the r11 derivation
    record (through r10) — both bounded, so CORRECTNESS_r11.json landing
    changes neither."""
    assert histogram(last_verified(through_round=9)) == {
        4: 46,
        5: 42,
        6: 44,
        8: 44,
        9: 50,
    }
    assert histogram(last_verified(through_round=R11_DERIVATION_ROUND)) == {
        4: 5,
        5: 40,
        6: 41,
        8: 40,
        9: 50,
        10: 50,
    }
    assert histogram(last_verified(through_round=R12_DERIVATION_ROUND)) == {
        6: 41,
        8: 40,
        9: 50,
        10: 49,
        11: 50,
    }
    assert histogram(last_verified(through_round=R13_DERIVATION_ROUND)) == {
        6: 1,
        8: 40,
        9: 50,
        10: 49,
        11: 49,
        12: 50,
    }
    assert histogram(last_verified(through_round=R14_DERIVATION_ROUND)) == {
        8: 3,
        9: 50,
        10: 49,
        11: 49,
        12: 49,
        13: 50,
    }
    assert histogram(last_verified(through_round=R15_DERIVATION_ROUND)) == {
        9: 23,
        10: 49,
        11: 49,
        12: 49,
        13: 46,
        14: 50,
    }
    assert histogram(last_verified(through_round=R16_DERIVATION_ROUND)) == {
        10: 31,
        11: 49,
        12: 49,
        13: 46,
        14: 49,
        15: 50,
    }
    assert histogram(last_verified(through_round=R17_DERIVATION_ROUND)) == {
        11: 38,
        12: 48,
        13: 46,
        14: 49,
        15: 48,
        16: 50,
    }


def test_r11_window_was_new_plus_changed_plus_pool_order():
    """The r11 derivation record, kept as history: its window was the
    never-verified r11 additions, then the r11-changed queries, then the
    CORRECTNESS_r01..r10 pool in pool() order. The r11 PREFIX itself has
    rotated away — this pins only the derivation inputs (the r11 window
    list lives in CORRECTNESS_r11.json's key order, which is immutable)."""
    lv = last_verified(through_round=R11_DERIVATION_ROUND)
    assert not any(n in lv for n in NEW_R11), "NEW_R11 not actually new"
    import json, os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "CORRECTNESS_r11.json")) as f:
        r11_window = list(json.load(f))
    lead = NEW_R11 + CHANGED_R11
    assert r11_window[: len(lead)] == lead
    rest = [n for n in pool(lv) if n not in lead]
    assert r11_window[len(lead) :] == rest[: 50 - len(lead)]


def test_r12_window_was_new_plus_changed_plus_pool_order():
    """The r12 derivation record, kept as history (same treatment the
    r11 window got when it rotated away): the r12 window list lives in
    CORRECTNESS_r12.json's key order, which is immutable."""
    lv = last_verified(through_round=R12_DERIVATION_ROUND)
    assert not any(n in lv for n in NEW_R12), "NEW_R12 not actually new"
    import json, os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "CORRECTNESS_r12.json")) as f:
        r12_window = list(json.load(f))
    lead = NEW_R12 + CHANGED_R12
    assert r12_window[: len(lead)] == lead
    rest = [n for n in pool(lv) if n not in lead]
    assert r12_window[len(lead) :] == rest[: 50 - len(lead)]
    # the strata the r12 derivation claimed: the first 40 of 41 r6 rows
    strata = [lv[n] for n in r12_window[len(lead) :]]
    assert strata == [6] * 40


def test_r13_window_was_new_plus_changed_plus_pool_order():
    """The r13 derivation record, kept as history (same treatment the
    r11/r12 windows got when they rotated away): the r13 window list
    lives in CORRECTNESS_r13.json's key order, which is immutable."""
    lv = last_verified(through_round=R13_DERIVATION_ROUND)
    assert not any(n in lv for n in NEW_R13), "NEW_R13 not actually new"
    import json, os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "CORRECTNESS_r13.json")) as f:
        r13_window = list(json.load(f))
    lead = NEW_R13 + CHANGED_R13
    assert r13_window[: len(lead)] == lead
    rest = [n for n in pool(lv) if n not in lead]
    assert r13_window[len(lead) :] == rest[: 50 - len(lead)]
    # the strata the r13 derivation claimed: the lone r6 row + 37 r8
    strata = [lv[n] for n in r13_window[len(lead) :]]
    assert strata == [6] + [8] * 37


def test_r14_window_was_new_plus_changed_plus_pool_order():
    """The r14 derivation record, kept as history (same treatment the
    r11-r13 windows got when they rotated away): the r14 window list
    lives in CORRECTNESS_r14.json's key order, which is immutable."""
    lv = last_verified(through_round=R14_DERIVATION_ROUND)
    assert not any(n in lv for n in NEW_R14), "NEW_R14 not actually new"
    import json, os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "CORRECTNESS_r14.json")) as f:
        r14_window = list(json.load(f))
    lead = NEW_R14 + CHANGED_R14
    assert r14_window[: len(lead)] == lead
    rest = [n for n in pool(lv) if n not in lead]
    assert r14_window[len(lead) :] == rest[: 50 - len(lead)]
    # the strata the r14 derivation claimed: 3 r8 UDF rows + 22 r9
    strata = [lv[n] for n in r14_window[len(lead) :]]
    assert strata == [8] * 3 + [9] * 22


def test_r15_window_was_new_plus_changed_plus_pool_order():
    """The r15 derivation record, kept as history (same treatment the
    r11-r14 windows got when they rotated away): the r15 window list
    lives in CORRECTNESS_r15.json's key order, which is immutable."""
    lv = last_verified(through_round=R15_DERIVATION_ROUND)
    assert not any(n in lv for n in NEW_R15), "NEW_R15 not actually new"
    import json, os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "CORRECTNESS_r15.json")) as f:
        r15_window = list(json.load(f))
    lead = NEW_R15 + CHANGED_R15
    assert r15_window[: len(lead)] == lead
    rest = [n for n in pool(lv) if n not in lead]
    assert r15_window[len(lead) :] == rest[: 50 - len(lead)]
    # the strata the r15 derivation claimed: all 23 r9 + first 18 r10
    strata = [lv[n] for n in r15_window[len(lead) :]]
    assert strata == [9] * 23 + [10] * 18


def test_r16_window_was_new_plus_changed_plus_pool_order():
    """The r16 derivation record, kept as history (same treatment the
    r11-r15 windows got when they rotated away): the r16 window list
    lives in CORRECTNESS_r16.json's key order, which is immutable."""
    lv = last_verified(through_round=R16_DERIVATION_ROUND)
    assert not any(n in lv for n in NEW_R16), "NEW_R16 not actually new"
    import json, os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "CORRECTNESS_r16.json")) as f:
        r16_window = list(json.load(f))
    lead = NEW_R16 + CHANGED_R16
    assert r16_window[: len(lead)] == lead
    rest = [n for n in pool(lv) if n not in lead]
    assert r16_window[len(lead) :] == rest[: 50 - len(lead)]
    # the strata the r16 derivation claimed: all 31 r10 + first 11 r11
    strata = [lv[n] for n in r16_window[len(lead) :]]
    assert strata == [10] * 31 + [11] * 11


def test_r17_window_is_new_plus_changed_plus_pool_order():
    """The r17 window must be exactly: the never-verified r17 additions,
    then the r17 changed-output query, then the rotation pool derived
    from CORRECTNESS_r01..r16 in pool() order (stalest round, then
    name) — i.e. the window is DERIVED, not hand-picked. With 6 new +
    1 changed (rotation-over-growth: the r16 verdict's item 1 mandated
    retiring the r11 stratum), the remaining 43 slots retire ALL 38
    r11-stale rows and the first 5 r12 rows — 50 exactly (43 r12 rows
    lead the r18 pool)."""
    prefix = registry._WINDOW_PREFIX
    lead = NEW_R17 + CHANGED_R17
    assert prefix[: len(lead)] == lead
    lv = last_verified(through_round=R17_DERIVATION_ROUND)
    assert not any(n in lv for n in NEW_R17), "NEW_R17 not actually new"
    rest = [n for n in pool(lv) if n not in lead]
    assert prefix[len(lead) :] == rest[: 50 - len(lead)]
    # sanity on the strata the derivation claims
    strata = [lv[n] for n in prefix[len(lead) :]]
    assert strata == sorted(strata)
    assert strata == [11] * 38 + [12] * 5
