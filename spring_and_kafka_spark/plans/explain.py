"""Physical-plan introspection helpers.

Used by the plan-audit tests (tests/test_plans.py) and the PLANS.md
generator (tools/explain_audit.py) to assert the properties the 100 TB
design depends on: pushdown, pruning, join strategy, shuffle counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The .explain('formatted') text, returned instead of printed."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges (hash/range repartitions; broadcast
    exchanges excluded — they ship a small table, not the data)."""
    plan = formatted_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def has_node(df: DataFrame, node_name: str) -> bool:
    return node_name in formatted_plan(df)
