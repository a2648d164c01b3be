"""Skew utilities and file source/sink round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spring_and_kafka_spark.operators.skew import salted_group_count, salted_join
from spring_and_kafka_spark.sources.files import (
    read_csv,
    read_json,
    write_partitioned,
)
from spring_and_kafka_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    plain = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey", "c_custkey").select(
        "o_orderkey", "c_name"
    )
    a = {tuple(map(str, r)) for r in plain.collect()}
    b = {tuple(map(str, r)) for r in salted.collect()}
    assert a == b and len(a) > 0


def test_salted_join_rejects_outer(spark):
    import pytest

    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    # right/full outer would emit one row per salt replica for unmatched
    # dim rows — the operator must refuse rather than silently duplicate
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(orders, customer, "o_custkey", "c_custkey", how=how)


def test_salted_join_salt_on_and_stats_detect_degeneracy(spark):
    """Byte-identical hot-key rows collapse to ONE salt under the content
    fallback (the degradation ADVICE r2 flagged); stats must expose it,
    and a caller-supplied salt_on column must restore the spread — with
    results identical in all cases."""
    # hot key 1: 200 byte-identical rows + a distinguishing id column
    rows = [(1, "same") for _ in range(200)] + [(k, f"v{k}") for k in range(2, 12)]
    fact = (
        spark.createDataFrame(rows, "k INT, payload STRING")
        .withColumn("row_id", F.monotonically_increasing_id())
    )
    # freeze row_id so the salt derived from it is retry-stable for the test
    fact = fact.localCheckpoint(eager=True)
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 12)], "dk INT, d STRING")

    # content fallback: payload identical → hottest key lands on 1 salt
    s1: dict = {}
    r1 = salted_join(
        fact.select("k", "payload"), dim, "k", "dk", salt_buckets=8, stats=s1
    )
    assert s1["hottest_key_rows"] == 200
    assert s1["hottest_key_salts"] == 1  # degraded — exactly the hazard

    # salt_on a distinguishing column: the hot key spreads
    s2: dict = {}
    r2 = salted_join(
        fact, dim, "k", "dk", salt_buckets=8, salt_on=F.col("row_id"), stats=s2
    )
    assert s2["hottest_key_rows"] == 200
    assert s2["hottest_key_salts"] > 4  # 200 rows over 8 buckets

    plain = fact.join(dim, fact.k == dim.dk)
    for r in (r1, r2):
        assert r.count() == plain.count() == 210


def test_salted_group_count_equals_plain(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    plain = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        r["o_orderstatus"]: r["n"]
        for r in salted_group_count(orders, "o_orderstatus").collect()
    }
    assert plain == salted


def test_csv_json_roundtrip(spark, tmp_path):
    df = load_table(spark, SF_SMOKE, "nation")
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    df.write.mode("overwrite").option("header", "true").csv(csv_dir)
    df.write.mode("overwrite").json(json_dir)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back_csv = read_csv(spark, csv_dir, schema)
    back_json = read_json(spark, json_dir, schema)
    want = {tuple(map(str, r)) for r in df.collect()}
    assert {tuple(map(str, r)) for r in back_csv.select(*schema.names).collect()} == want
    assert {tuple(map(str, r)) for r in back_json.select(*schema.names).collect()} == want


def test_write_partitioned_prunes(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_part")
    write_partitioned(
        orders,
        path,
        partition_by=["o_orderstatus"],
        sort_within=["o_orderdate"],
    )
    back = spark.read.parquet(path)
    sub = back.filter(F.col("o_orderstatus") == "F")
    # partition pruning: only the o_orderstatus=F directory is scanned
    from spring_and_kafka_spark.plans import formatted_plan

    plan = formatted_plan(sub)
    assert "PartitionFilters: [" in plan
    assert sub.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_orc_roundtrip_preserves_table(spark, tmp_path):
    """ORC sink → scan round-trips the orders fixture exactly (schema
    and values), and ORC scans push filters like parquet does."""
    from spring_and_kafka_spark.plans import formatted_plan
    from spring_and_kafka_spark.sources.files import read_orc, write_orc
    from spring_and_kafka_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.schema == orders.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orders.collect())
    )
    p = formatted_plan(back.filter(back.o_totalprice > 4000))
    assert "PushedFilters: [" in p and "o_totalprice" in p
