"""Query/operator registry — the single source of truth behind
``__spark_entry__.py``.

Each operator from SURVEY.md §2 registers a :class:`QuerySpec` holding the
PySpark implementation and (when SQL-expressible) the equivalent DuckDB
oracle SQL. The driver hash-compares the two at sf0.01; queries without
oracle SQL get a rows-only check.

Conventions (hash-match discipline, SURVEY.md §5.2):
- alias every computed column identically in Spark and SQL
- round money sums to 2 decimals, averages/ratios to 4-6, cosines to 6
- EXCEPTION (the q_compaction_plan round-6 lesson): when the unrounded
  value is an exact-integer ratio landing exactly ON the rounding
  boundary (cents/100, bytes/10^4), do NOT wrap it in engine round() —
  either emit the integer itself (fill_bp) or the bare single IEEE
  division (cents/100.0): both are bit-identical across engines, while
  round() implementations diverge across DuckDB builds precisely at
  boundary values. round() is for values with real excess digits (real
  averages, libm outputs), where boundary hits are measure-zero
- cast engine-divergent types explicitly (DuckDB SUM(int)→HUGEINT vs Spark
  →long; DuckDB ceil(double)→double vs Spark →long; DuckDB CAST(double AS
  BIGINT) rounds vs Spark truncates)
- break all ranking/top-k ties with a unique key column
- case-mapping parity holds except Unicode special casing (Turkish İ,
  German ß→SS, Greek word-final Σ): JVM applies full/context mappings,
  utf8proc simple ones — corpora containing those contexts need a
  casefold at ingest (divergences pinned in tests/test_unicode.py)
- guard every data-dependent denominator with F.when(denom != 0, ...):
  ANSI Spark throws DIVIDE_BY_ZERO on ANY division by zero (doubles
  included) while DuckDB yields NULL — the guard reproduces DuckDB's
  semantics so degenerate inputs (constant series, zero totals,
  singular matrices, zero vectors) keep parity instead of crashing
  (tests/test_degenerate.py builds each shape and asserts it)
- NULL rules (the round-9 NULLCHECK battery — tools/null_sweep.py,
  tests/test_nullcheck.py): payload columns (text, embedding) filter
  NULL at the operator scan in BOTH engines; any nullable window ORDER
  BY key pins NULLS FIRST in the oracle (Spark asc defaults NULLS
  FIRST, DuckDB NULLS LAST); joins on keys a Spark window/groupBy keeps
  as NULL groups must be null-safe (eqNullSafe / IS NOT DISTINCT FROM);
  oracle string concat uses || (DuckDB concat() IGNORES NULL args,
  Spark's propagates); DuckDB greatest()/least() and count(DISTINCT x)
  SKIP NULLs — count NULL categories via count(*) over SELECT DISTINCT;
  Spark collect_list skips NULLs but DuckDB list() keeps them
  (list_filter to mirror); carrying values across rows with
  last(ignorenulls) must wrap the source ROW in a struct or a
  legitimately-NULL value resurrects stale rows; Python UDFs receive
  raw None and must answer NULL themselves
- a LIMIT boundary may only rank on cross-engine-STABLE keys: integers,
  rounded doubles, or doubles built from +,* alone with matching
  association order in both engines (IEEE-deterministic — the dot
  products in llm/similarity.py qualify). libm outputs (log/log2/trig)
  differ by 1 ulp between JVM and DuckDB, and scores derived from
  repeated integer counts make near-ties STRUCTURAL, so ranking raw
  libm scores at a LIMIT edge is a latent hash flake — round first,
  then tiebreak (the q_text_keyphrase lesson, round 6; all 13 top-k
  oracles audited against this rule that round)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    module: str = ""  # defining module (ordering key, see _MODULE_ORDER)
    seq: int = 0  # def order within the module (ordering tie-break)


_REGISTRY: dict[str, QuerySpec] = {}
_MODULE_SEQ: dict[str, int] = {}

# The driver hash-verifies EXACTLY the first 50 exposed entries each
# round. _WINDOW_PREFIX names those 50 explicitly — rotated per round so
# every query eventually owns a green CORRECTNESS row.
#
# Round-17 window. Rotation pool derived PROGRAMMATICALLY —
# `python -m tools.window_pool` folds CORRECTNESS_r01..r16 into the
# last-verified map. Tool output this rotation (through_round=16):
#   histogram: r11=38, r12=48, r13=46, r14=49, r15=48, r16=50
#   (279, 0 never)
# pinned (round-bounded, so next round's artifact can't break it) in
# tests/test_registry_window.py.
#
# Composition, per the rotation discipline (rule order: never-verified >
# red fixes > changed output > stalest green). The r16 verdict's item 1
# mandated this exact rotation: the new-op batch stays small (6, under
# the <=10 cap) so the window retires ALL 38 remaining r11 rows plus
# the r12 pool head:
#   (a) the 6 queries NEW in r17 (q_dedup_keep_best q_dedup_span_align
#       q_dedup_span_cover q_sim_ivf_probe_curve q_sim_ivfpq_search
#       q_sim_rerank_grid — the canonical-doc selection per near-dup
#       cluster, the arbitrary-offset anchor-ngram span alignment
#       closing the gap q_dedup_substring's docstring names, its
#       per-doc interval-union excision readout on the raw corpus, the
#       recall-vs-probe-count IVF curve, the composed IVF-probe x
#       PQ-rank serving query, and the multi-query
#       recall-vs-shortlist-length grid replacing the 1-query rerank
#       curve readout; the r16 verdict's Next-round items 2/3 plus
#       family-completing rollups, pool() round-0 name order) — never
#       driver-verified, so they lead;
#   (b) the 1 query whose OUTPUT expression changed in r17:
#       q_winsorize (band edges moved from engine percentile functions
#       onto exact integer RANK DECOMPOSITION — ADVICE r16 item 2: the
#       r16 cents form still double-interpolated, divergent within 1
#       ulp of a half-cent);
#   (c) the rotation pool in tools.window_pool pool() order: all 38
#       r11-stale rows + the first 5 of the 48 r12 rows —
#       6+1+38+5 = 50 exactly.
# After this window the stalest green rows are the 43 remaining r12
# rows (q_agg_percentile q_agg_stats q_case_when q_cube q_distinct
# and the rest in pool order) then the 46 r13 rows — the r18 pool
# head.
# Queries not named here rank after the prefix by (module rank, def
# order) — the safe place for additions until rotated in.
_WINDOW_PREFIX = [
    # (a) new-in-r17, never verified — pool() round-0 name order
    "q_dedup_keep_best",
    "q_dedup_span_align",
    "q_dedup_span_cover",
    "q_sim_ivf_probe_curve",
    "q_sim_ivfpq_search",
    "q_sim_rerank_grid",
    # (b) output expression changed in r17 (integer rank decomposition)
    "q_winsorize",
    # (c) the rotation pool, tools.window_pool order: 38 r11 + 5 r12
    "q_er_blocking",
    "q_fn_url",
    "q_graph_degree",
    "q_graph_triangles",
    "q_heavy_hitters",
    "q_hist_equiwidth",
    "q_interval_peak",
    "q_join_bloom",
    "q_join_overlap",
    "q_join_pit",
    "q_kanon",
    "q_langid_confusion",
    "q_multimodal_dedup",
    "q_pii_scan",
    "q_profile",
    "q_rfm",
    "q_sample_balanced",
    "q_scd2",
    "q_seq_pattern",
    "q_share_of_total",
    "q_skyline",
    "q_text_bm25",
    "q_text_js_shift",
    "q_text_keyphrase",
    "q_text_length_filter",
    "q_text_vocab_coverage",
    "q_text_zipf",
    "q_tpch_q9",
    "q_ts_anomaly",
    "q_ts_autocorr",
    "q_ts_cusum",
    "q_ts_ewma",
    "q_ts_mad",
    "q_ts_resample",
    "q_unpivot",
    "q_win_first_last",
    "q_win_running_distinct",
    "q_win_trend",
    "q_agg_bool",
    "q_agg_distinct",
    "q_agg_having",
    "q_agg_moments",
    "q_agg_ols2",
]
_WINDOW_RANK = {n: i for i, n in enumerate(_WINDOW_PREFIX)}

# Fallback ordering for everything past the window prefix — stable and
# immune to import order (a test importing an operator module directly
# before the first all_specs() call cannot shift queries in or out of
# the driver's verification window).
_MODULE_ORDER = [
    "spring_and_kafka_spark.llm.dedup",
    "spring_and_kafka_spark.llm.corpus_ops",
    "spring_and_kafka_spark.streaming.batch_equiv",
    "spring_and_kafka_spark.functions.scalar",
    "spring_and_kafka_spark.llm.similarity",
    "spring_and_kafka_spark.operators.sampling",
    "spring_and_kafka_spark.operators.joins",
    "spring_and_kafka_spark.operators.aggregates",
    "spring_and_kafka_spark.llm.text",
    "spring_and_kafka_spark.llm.multimodal",
    "spring_and_kafka_spark.llm.pipeline",
    "spring_and_kafka_spark.functions.semistructured",
    "spring_and_kafka_spark.operators.udfs",
    "spring_and_kafka_spark.operators.timeseries",
    "spring_and_kafka_spark.operators.analytics",
    "spring_and_kafka_spark.operators.relational",
    "spring_and_kafka_spark.operators.windows",
    "spring_and_kafka_spark.operators.skew",
    "spring_and_kafka_spark.streaming.slide",
    "spring_and_kafka_spark.operators.sketches",
    "spring_and_kafka_spark.operators.graph",
    "spring_and_kafka_spark.llm.retrieval",
    "spring_and_kafka_spark.operators.tpch",
    "spring_and_kafka_spark.operators.profiling",
    "spring_and_kafka_spark.operators.quality",
    "spring_and_kafka_spark.operators.layout",
    "spring_and_kafka_spark.operators.geo",
]
_MODULE_RANK = {m: i for i, m in enumerate(_MODULE_ORDER)}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        mod = fn.__module__
        seq = _MODULE_SEQ.get(mod, 0)
        _MODULE_SEQ[mod] = seq + 1
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            tags=tags,
            doc=(fn.__doc__ or ""),
            module=mod,
            seq=seq,
        )
        return fn

    return deco


def _order_key(spec: QuerySpec) -> tuple[int, int, str, int]:
    if spec.name in _WINDOW_RANK:
        return (0, _WINDOW_RANK[spec.name], "", 0)
    rank = _MODULE_RANK.get(spec.module, len(_MODULE_ORDER))
    return (1, rank, spec.module, spec.seq)


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent).

    Exposure order is decided by _WINDOW_PREFIX then _MODULE_ORDER +
    within-module def order (see all_specs), NOT by this import list —
    imports here only ensure every module is loaded."""
    import spring_and_kafka_spark.llm.corpus_ops  # noqa: F401  (pulls llm.dedup first)
    import spring_and_kafka_spark.streaming.batch_equiv  # noqa: F401
    import spring_and_kafka_spark.functions.scalar  # noqa: F401
    import spring_and_kafka_spark.llm.similarity  # noqa: F401
    import spring_and_kafka_spark.operators.sampling  # noqa: F401
    import spring_and_kafka_spark.operators.joins  # noqa: F401
    import spring_and_kafka_spark.operators.aggregates  # noqa: F401
    import spring_and_kafka_spark.llm.text  # noqa: F401
    import spring_and_kafka_spark.llm.multimodal  # noqa: F401
    import spring_and_kafka_spark.llm.pipeline  # noqa: F401
    import spring_and_kafka_spark.functions.semistructured  # noqa: F401
    import spring_and_kafka_spark.operators.udfs  # noqa: F401
    import spring_and_kafka_spark.operators.timeseries  # noqa: F401
    import spring_and_kafka_spark.operators.analytics  # noqa: F401
    import spring_and_kafka_spark.operators.relational  # noqa: F401
    import spring_and_kafka_spark.operators.windows  # noqa: F401
    # round-3 additions register strictly AFTER the 50-slot window prefix
    import spring_and_kafka_spark.operators.skew  # noqa: F401
    import spring_and_kafka_spark.streaming.slide  # noqa: F401
    import spring_and_kafka_spark.operators.sketches  # noqa: F401
    import spring_and_kafka_spark.operators.graph  # noqa: F401
    import spring_and_kafka_spark.llm.retrieval  # noqa: F401
    import spring_and_kafka_spark.operators.tpch  # noqa: F401
    import spring_and_kafka_spark.operators.profiling  # noqa: F401
    import spring_and_kafka_spark.operators.quality  # noqa: F401
    import spring_and_kafka_spark.operators.layout  # noqa: F401
    import spring_and_kafka_spark.operators.geo  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _load_all_modules()
    return {
        spec.name: spec
        for spec in sorted(_REGISTRY.values(), key=_order_key)
    }


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
