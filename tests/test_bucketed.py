"""Bucketed-table join: the recurring-join answer at scale — both sides
pre-partitioned on the key in the table layout, so the join plans with NO
shuffle exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from spring_and_kafka_spark.plans import formatted_plan
from spring_and_kafka_spark.sources.files import write_bucketed_table
from spring_and_kafka_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return formatted_plan(df)


def test_bucketed_join_has_no_shuffle(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    write_bucketed_table(
        lineitem, "b_lineitem", ["l_orderkey"], 8, sort_by=["l_orderkey"]
    )
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        # merge hint: small fixtures would otherwise broadcast; the point
        # here is the large-large case where both sides are bucketed
        joined = bl.hint("merge").join(bo, bl.l_orderkey == bo.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        plan = _plan(joined)
        # co-located buckets: sort-merge join with NO shuffle exchange
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and it is still correct
        want = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
