"""Benchmark harness (BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], one warm-up + N timed runs (median), and prints
ONE JSON line:

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Usage: python bench.py [--runs 3] [--all]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spring_and_kafka_spark import registry
from spring_and_kafka_spark.session import get_spark

# Representative of every operator family (SURVEY.md §2): scan-agg, joins
# (shuffle/broadcast/asof), windows, set/pivot, streaming-batch, LLM ops.
HEADLINE = [
    "q_agg_group",
    "q_join_multi",
    "q_join_broadcast",
    "q_join_asof",
    "q_win_frame_rows",
    "q_topk_per_group",
    "q_pivot",
    "q_stream_tumble",
    "q_dedup_ngram",
    "q_dedup_near",
    "q_dedup_embed",
    "q_sim_topk",
    "q_text_tfidf",
    "q_text_langid",
    "q_udf_pandas",
    "q_gapfill",
    "q_fn_decimal",
    "q_subquery_scalar",
    "q_sim_knn_all",
    "q_pipeline_curate",
    # added round 2 (BASELINE.md §2 notes the headline-set change)
    "q_dedup_clusters_lsh",
    "q_text_repetition",
    # added round 4: TPC-H representatives (scan-agg, 6-table broadcast
    # star, pre-agg join, semi join) + BM25
    "q_tpch_q5",
    "q_tpch_q9",
    "q_tpch_q18",
    "q_tpch_q21",
    "q_text_bm25",
    # added round 5: never-benched families — iterative graph + SCD-2
    # two-window pass (BASELINE.md §2 notes the headline-set change)
    "q_graph_pagerank",
    "q_scd2",
    # added round 5, second batch: governance profiling (multi-distinct
    # Expand) + retrieval-index construction (term-keyed shuffle family)
    "q_profile",
    "q_text_inverted_index",
    # added round 5, third batch: warehouse cohort rollup (two custkey
    # shuffles) + iterative embedding-structure probe (3 unrolled
    # power-iteration passes)
    "q_cohort_revenue",
    "q_embed_pca",
    # added round 6: the round's new operators — grid-blocked spatial
    # argmin, per-source entropy (vocabulary-sized second agg),
    # per-dimension embedding profile, partition-freshness audit
    # (BASELINE.md §2 notes the headline-set change)
    "q_geo_nearest",
    "q_text_entropy",
    "q_embed_dim_stats",
    "q_dq_freshness",
    # round-11 additions: classifier validation, length filter,
    # mix drift, cluster purity
    "q_langid_confusion",
    "q_text_length_filter",
    "q_text_js_shift",
    "q_embed_cluster_purity",
    # round-12 additions: suite-completing TPC-H adaptations (min-window
    # supplier selection, scalar-threshold, derived ship class), the
    # second iterative-graph family (CC: diameter-bounded double-step
    # propagation — ~6 s of honest per-round job overhead at sf0.1),
    # embedding outlier flags, exact-octile equi-depth histogram,
    # l-diversity audit (BASELINE.md §2 notes the headline-set change)
    "q_tpch_q2",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_graph_cc",
    "q_embed_outlier",
    "q_hist_equidepth",
    "q_ldiversity",
    # round-12 second batch: aggregate-as-window exact median + robust
    # pairwise-slope trend (both on micro-unit integer daily revenue)
    "q_win_rolling_median",
    "q_ts_theilsen",
    # round-13 additions: wedge-join neighborhood similarity, iterative
    # 2-core peel, t-closeness privacy audit, seasonal-adjusted MAD,
    # zero-shuffle script-mix projection, @udtf lateral surface
    # (BASELINE.md §2 notes the headline-set change)
    "q_graph_jaccard",
    "q_graph_kcore",
    "q_tcloseness",
    "q_ts_stl_residual",
    "q_text_script_mix",
    "q_udf_udtf",
    "q_seq_markov",
    "q_hist_log2",
    "q_embed_recall_eval",
    "q_graph_bfs",
    "q_er_score",
    # round-14 additions: per-node triangle density (oriented wedge
    # reuse), power-of-two degree histogram, PQ distortion/recall eval,
    # session-bounded Markov matrix, integer-moment degree
    # assortativity, sign-sketch Hamming top-k (zero-shuffle signature
    # build), RRF fusion of the exact and sketch rankers, NDCG@10
    # sketch-ranking eval (BASELINE.md §2 notes the headline-set change)
    "q_graph_lcc",
    "q_graph_degree_dist",
    "q_embed_pq_eval",
    "q_seq_markov_session",
    "q_graph_assortativity",
    "q_sim_hamming_topk",
    "q_embed_rrf",
    "q_embed_ndcg_eval",
    # round-14 second batch: IVF cell-balance audit (one
    # broadcast-centroid pass + k-row windows), lexical diversity
    # (two gram-keyed pre-aggregated shuffles), integer-moment lead/lag
    # cross-correlation, gaps-and-islands streaks (one user-keyed
    # shuffle reused by window + both groupBys)
    "q_embed_ivf_balance",
    "q_text_diversity",
    "q_ts_crosscorr",
    "q_user_streak",
    # round-14 third batch: brand-partition modularity (integer Q over
    # the thinned co-order graph), join-key skew audit (one
    # map-side-combined pass per key column), near-dup threshold curve
    # (bounded-sample fold-cosine pairs, one conditional agg)
    "q_graph_modularity",
    "q_skew_audit",
    "q_embed_threshold_curve",
    # round-14 fourth batch: the n-gram Jaccard twin of the embed
    # threshold curve (integer cross-multiplied comparisons, one
    # conditional agg over the df-capped pair stream)
    "q_dedup_threshold_curve",
    # round-15 batch: Gopher rule battery (zero-join narrow pass),
    # cross-source template detection (segment groupBy + rejoin),
    # collocation PMI (two materialized gram tables + heap),
    # offline changepoint (stacked same-key windows), rank-biased
    # overlap (two heaps + broadcast overlap), MinHash calibration
    # (sample-pushed wide min-agg + shingle-join pairs)
    "q_quality_gopher",
    "q_text_boilerplate",
    "q_text_pmi",
    "q_ts_changepoint",
    "q_embed_rbo",
    "q_dedup_minhash_est",
    # round-15 second batch: Matryoshka truncation recall curve
    # (per-(query,dim) heaps over one corpus pass), KS sampling audit
    # (value-bounded ECDF windows, one row out)
    "q_embed_matryoshka_eval",
    "q_sample_ks_check",
    # round-16 batch: per-doc span-excision readout (segment table +
    # doc_id-keyed window/groupBy tail), segment-df calibration
    # histogram (two map-side groupBys, no join), LPA communities
    # (self-vote majority propagation + the shared modularity readout
    # — the iterative-graph job-overhead class), Hamming-shortlist
    # exact re-rank (three TakeOrdered heaps over the materialized
    # corpus) and its recall-vs-length curve (one heap + a broadcast
    # 4-row grid) (BASELINE.md §2 notes the headline-set change)
    "q_dedup_substring",
    "q_dedup_seg_df_hist",
    "q_graph_lpa",
    "q_sim_rerank",
    "q_sim_rerank_curve",
    # round-17 batch: arbitrary-offset span alignment (sliding sha2
    # anchor hashes over the planted shifted corpus — the hash pass
    # dominates; candidates bucketed by anchor hash), its per-doc
    # interval-union excision readout on the raw corpus, and the
    # multi-query rerank recall grid (per-qid WindowGroupLimit heaps
    # over two corpus passes) (BASELINE.md §2 notes the change)
    "q_dedup_span_align",
    "q_dedup_span_cover",
    "q_sim_rerank_grid",
    # round-17 second batch: canonical-doc selection (LSH clusters +
    # one component-keyed keeper window) and the recall-vs-probe-count
    # IVF curve (one materialized corpus x query-sample cosine pass,
    # per-(level, qid) WindowGroupLimit heaps)
    "q_dedup_keep_best",
    "q_sim_ivf_probe_curve",
    # round-17 third batch: the composed IVF-probe x PQ-rank serving
    # query (one PQ encode pass + probed-cell ADC ranking, the single
    # co-partitioned vec_id recon join)
    "q_sim_ivfpq_search",
]


def time_query(spark, fn, sf_dir: str, runs: int) -> float:
    def once() -> float:
        t0 = time.perf_counter()
        # count() forces full execution without driver-side materialization
        fn(spark, sf_dir).count()
        return time.perf_counter() - t0

    once()  # warm-up (plan + code cache)
    return statistics.median(once() for _ in range(runs))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--all", action="store_true", help="bench every query")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark("bench")

    specs = registry.all_specs()
    names = sorted(specs) if args.all else [n for n in HEADLINE if n in specs]
    timings: dict[str, float] = {}
    for name in names:
        timings[name] = round(time_query(spark, specs[name].fn, sf_dir, args.runs), 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
