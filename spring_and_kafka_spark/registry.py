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
    a driver-green CORRECTNESS row register first. Round 1 verified the
    relational/join/window/aggregate families; round 2 rotates the LLM-data
    operators, semistructured/UDF/timeseries/sampling/analytics queries to
    the front, followed by the two reshaped aggregates (q_agg_approx /
    q_agg_collect, first in their module, landing at window slots 48-49).
    The streaming batch-twins and scalar-function tail rotate into the
    window next round."""
    import spring_and_kafka_spark.llm.dedup  # noqa: F401
    import spring_and_kafka_spark.llm.similarity  # noqa: F401
    import spring_and_kafka_spark.llm.text  # noqa: F401
    import spring_and_kafka_spark.llm.multimodal  # noqa: F401
    import spring_and_kafka_spark.llm.pipeline  # noqa: F401
    import spring_and_kafka_spark.functions.semistructured  # noqa: F401
    import spring_and_kafka_spark.operators.udfs  # noqa: F401
    import spring_and_kafka_spark.operators.timeseries  # noqa: F401
    import spring_and_kafka_spark.operators.sampling  # noqa: F401
    import spring_and_kafka_spark.operators.analytics  # noqa: F401
    import spring_and_kafka_spark.operators.aggregates  # noqa: F401
    import spring_and_kafka_spark.llm.corpus_ops  # noqa: F401
    import spring_and_kafka_spark.streaming.batch_equiv  # noqa: F401
    import spring_and_kafka_spark.functions.scalar  # noqa: F401
    import spring_and_kafka_spark.operators.relational  # noqa: F401
    import spring_and_kafka_spark.operators.joins  # noqa: F401
    import spring_and_kafka_spark.operators.windows  # noqa: F401


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
