"""Semantic tests for the storage-layout and warehouse-reconciliation
operators (layout.py, q_snapshot_diff, q_skew_report, q_ts_seasonality).
The DuckDB hash-parity suite covers value equality; these assert the
CLAIMED physics — that the layouts actually differ in prunability, that
the CDC classification partitions the keyspace, that the skew stats are
internally consistent."""

from __future__ import annotations

from .conftest import SF_CORRECT, SF_SMOKE


def test_zonemap_date_layout_prunes_scattered_does_not(spark):
    from spring_and_kafka_spark.operators.layout import q_zonemap_prune

    by_layout = {
        r["layout"]: r for r in q_zonemap_prune(spark, SF_CORRECT).collect()
    }
    assert set(by_layout) == {"date_partitioned", "scattered"}
    dp, sc = by_layout["date_partitioned"], by_layout["scattered"]
    # scattered files all straddle the predicate window: nothing skipped
    assert sc["files_skipped"] == 0 and sc["scan_fraction"] == 1.0
    # date-partitioned zone maps skip most files; the scan fraction is
    # roughly the predicate's 1-year share of the ~7-year date range
    assert dp["files_skipped"] > dp["n_files"] // 2
    assert dp["scan_fraction"] < 0.35
    # the scattered layout scans everything; the partitioned one reads
    # only the files that can hold predicate rows
    from spring_and_kafka_spark.sources.tables import load_table

    total = load_table(spark, SF_CORRECT, "lineitem").count()
    assert sc["rows_scanned"] == total
    assert dp["rows_scanned"] < total * 0.2


def test_zorder_bounds_both_dims_sort_bounds_one(spark):
    from spring_and_kafka_spark.operators.layout import q_zorder_layout

    by_layout = {
        r["layout"]: r for r in q_zorder_layout(spark, SF_CORRECT).collect()
    }
    z, c = by_layout["zorder"], by_layout["cust_sorted"]
    assert z["n_rows"] == c["n_rows"]
    # the custkey sort gives near-minimal cust spans but full-width date
    # spans; z-order trades a bounded cust span for a far tighter date
    # span — prunable on EITHER predicate column
    assert c["avg_cust_span"] <= z["avg_cust_span"]
    assert z["avg_date_span"] < c["avg_date_span"] / 4
    # a 16-bit z-value >> 10 can address at most 64 files
    assert z["n_files"] <= 64


def test_snapshot_diff_partitions_the_keyspace(spark):
    from spring_and_kafka_spark.operators.analytics import (
        _CDC_DEL,
        _CDC_INS,
        _CDC_UPD,
        q_snapshot_diff,
    )
    from spring_and_kafka_spark.sources.tables import load_table

    rows = {r["change_type"]: r for r in q_snapshot_diff(spark, SF_SMOKE).collect()}
    assert set(rows) == {"insert", "update", "delete", "unchanged"}
    keys = [
        r["o_orderkey"]
        for r in load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey")
        .collect()
    ]
    n = len(keys)
    n_del = sum(1 for k in keys if k % _CDC_DEL == 0)
    n_ins = sum(1 for k in keys if k % _CDC_INS == 0)
    n_upd = sum(1 for k in keys if k % _CDC_DEL != 0 and k % _CDC_UPD == 0)
    assert rows["delete"]["n_rows"] == n_del
    assert rows["insert"]["n_rows"] == n_ins
    assert rows["update"]["n_rows"] == n_upd
    # every snapshot-A key lands in exactly one non-insert class
    assert (
        rows["delete"]["n_rows"]
        + rows["update"]["n_rows"]
        + rows["unchanged"]["n_rows"]
        == n
    )
    # deletes remove value, updates add 10%
    assert rows["delete"]["price_delta"] < 0
    assert rows["update"]["price_delta"] > 0
    assert rows["unchanged"]["price_delta"] == 0.0


def test_skew_report_consistent_on_uniform_keys(spark):
    from spring_and_kafka_spark.operators.skew import q_skew_report
    from spring_and_kafka_spark.sources.tables import load_table

    r = q_skew_report(spark, SF_SMOKE).collect()[0]
    li = load_table(spark, SF_SMOKE, "lineitem")
    assert r["n_keys"] == li.select("l_partkey").distinct().count()
    assert 1.0 <= r["skew_ratio"]
    assert r["p50_size"] <= r["p99_size"] <= r["max_size"]
    # TPC-H partkeys are uniform: no key should dominate
    assert r["top1_share"] < 0.01


def test_seasonality_indices_average_to_one(spark):
    from spring_and_kafka_spark.operators.timeseries import q_ts_seasonality

    rows = q_ts_seasonality(spark, SF_SMOKE).collect()
    assert [r["dow"] for r in rows] == sorted(r["dow"] for r in rows)
    assert set(r["dow"] for r in rows) <= set(range(1, 8))
    total = sum(r["n_events"] for r in rows)
    weighted = sum(r["seasonality_index"] * r["n_events"] for r in rows)
    assert abs(weighted / total - 1.0) < 0.01


def test_mv_incremental_equals_full_recompute(spark):
    """The query's own oracle already proves incremental == recompute via
    the driver hash; here we rebuild snapshot B independently in Spark
    and assert the merged MV matches it row-for-row."""
    import pyspark.sql.functions as F

    from spring_and_kafka_spark.operators.layout import (
        _MV_DEL,
        _MV_INS,
        _MV_UPD,
        q_mv_incremental,
    )
    from spring_and_kafka_spark.sources.tables import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    key = F.col("o_orderkey")
    snap_b = (
        o.filter(key % _MV_DEL != 0)
        .select(
            "o_orderdate",
            F.when(key % _MV_UPD == 0, F.col("o_totalprice") * 1.1)
            .otherwise(F.col("o_totalprice"))
            .alias("price"),
        )
        .unionByName(
            o.filter(key % _MV_INS == 0).select(
                "o_orderdate", F.col("o_totalprice").alias("price")
            )
        )
    )
    full = {
        r["month_id"]: (r["n_orders"], r["revenue_cents"])
        for r in snap_b.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("month_id")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.floor(F.col("price") * 100 + F.lit(0.5)).cast("long")
            ).alias("revenue_cents"),
        )
        .collect()
    }
    inc = {
        r["month_id"]: (r["n_orders"], r["revenue_cents"])
        for r in q_mv_incremental(spark, SF_SMOKE).collect()
    }
    assert inc == full


def test_compaction_plan_conserves_bytes_and_fills_bins(spark):
    import pyspark.sql.functions as F

    from spring_and_kafka_spark.operators.layout import (
        _COMPACT_FILES,
        _COMPACT_TARGET,
        q_compaction_plan,
    )
    from spring_and_kafka_spark.sources.tables import load_table

    rows = q_compaction_plan(spark, SF_SMOKE).collect()
    d = load_table(spark, SF_SMOKE, "documents")
    inv = (
        d.groupBy((F.col("doc_id") % _COMPACT_FILES).alias("file_id"))
        .agg(F.sum(F.length("text")).alias("sz"))
        .collect()
    )
    # conservation: every inventory file lands in exactly one bin
    assert sum(r["n_files"] for r in rows) == len(inv)
    assert sum(r["total_bytes"] for r in rows) == sum(r["sz"] for r in inv)
    # bins are dense 0..k
    assert [r["bin_id"] for r in rows] == list(range(len(rows)))
    # next-fit invariant: a bin closes only once the running total has
    # crossed its target, so every bin except the last holds at least
    # target - max_single_file bytes
    max_file = max(r["sz"] for r in inv)
    for r in rows[:-1]:
        assert r["total_bytes"] >= _COMPACT_TARGET - max_file
