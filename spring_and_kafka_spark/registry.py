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


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent).

    Registration order is deliberate: the driver verifies a fixed-size
    prefix of the registry each round, so modules whose queries still lack
    a driver-green CORRECTNESS row register first. Rounds 1-2 greened the
    relational/join/window/aggregate families and the LLM-data/
    semistructured/UDF/timeseries/sampling/analytics set. Round 3 rotates
    the last never-verified entries to the front — llm.corpus_ops (6),
    streaming.batch_equiv (3), functions.scalar tail (9) — together with
    the three queries converted this round from rows-only to full SQL
    oracles (q_dedup_simhash, q_sim_lsh_bucket, q_sample_seeded) and the
    two whose oracles were rewritten in the round-2 diff after that
    round's window froze (q_join_asof at slot 47, q_agg_argmax at 50).
    NOTE: llm.corpus_ops imports llm.dedup, so dedup's 7 queries register
    first (slots 1-7) regardless of this list's textual order; the window
    is exactly slots 1-50 = dedup 7 + corpus_ops 6 + batch_equiv 3 +
    scalar 10 + similarity 6 + sampling 3 + joins 12 + aggregates'
    first 3."""
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


def all_specs() -> dict[str, QuerySpec]:
    _load_all_modules()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
