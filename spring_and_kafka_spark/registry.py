"""Query/operator registry — the single source of truth behind
``__spark_entry__.py``.

Each operator from SURVEY.md §2 registers a :class:`QuerySpec` holding the
PySpark implementation and (when SQL-expressible) the equivalent DuckDB
oracle SQL. The driver hash-compares the two at sf0.01; queries without
oracle SQL get a rows-only check.

Conventions (hash-match discipline, SURVEY.md §5.2):
- alias every computed column identically in Spark and SQL
- round money sums to 2 decimals, averages/ratios to 4-6, cosines to 6
- cast engine-divergent types explicitly (DuckDB SUM(int)→HUGEINT vs Spark
  →long; DuckDB ceil(double)→double vs Spark →long; DuckDB CAST(double AS
  BIGINT) rounds vs Spark truncates)
- break all ranking/top-k ties with a unique key column
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

# Canonical module order for the driver's fixed-size verification window.
# all_specs() SORTS by (this ranking, def order within module), so the
# exposed order is immune to import order — a test or caller importing an
# operator module directly before the first all_specs() call can no
# longer shift queries in or out of the driver's 50-slot window prefix.
# Modules not listed rank last (alphabetically) — the safe place for
# additions until the next rotation.
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


def _order_key(spec: QuerySpec) -> tuple[int, str, int]:
    rank = _MODULE_RANK.get(spec.module, len(_MODULE_ORDER))
    return (rank, spec.module, spec.seq)


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent).

    Exposure order is decided by _MODULE_ORDER + within-module def order
    (see all_specs), NOT by this import list — imports here only ensure
    every module is loaded. The driver verifies a fixed-size prefix of
    the exposed order each round; round 3's rotation puts the 18
    never-verified entries — llm.corpus_ops (6), streaming.batch_equiv
    (3), functions.scalar tail (9) — plus the three queries converted
    from rows-only to full SQL oracles (q_dedup_simhash,
    q_sim_lsh_bucket, q_sample_seeded) and the two whose oracles were
    rewritten after round-2's window froze (q_join_asof at slot 47,
    q_agg_argmax at 50) inside the 50-slot window: slots 1-50 = dedup 7
    + corpus_ops 6 + batch_equiv 3 + scalar 10 + similarity 6 +
    sampling 3 + joins 12 + aggregates' first 3 (pinned by
    tests/test_entry.py)."""
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
