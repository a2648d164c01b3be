"""The float ingest contract (DESIGN.md #19): external double columns
are normalized FINITE-OR-NULL at the boundary (exec_utils.finite_or_null)
because NaN/±Inf semantics are cross-engine unspecifiable — the round-9
NaN diagnostic (NANCHECK.json) failed 39/226 queries on raw NaN input,
with both engines hard-erroring on NaN→BIGINT casts (every exact-cents
expression). After normalization, NaN follows the NULL path that the
NULLCHECK battery proves all 226 queries handle."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from spring_and_kafka_spark.exec_utils import cents, finite_or_null


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, 10.0),
            (2, float("nan")),
            (3, float("inf")),
            (4, float("-inf")),
            (5, None),
            (6, -2.5),
        ],
        "id long, x double",
    )


def test_normalizer_maps_nan_and_inf_to_null(spark):
    rows = {r.id: r.x for r in finite_or_null(_frame(spark), "x").collect()}
    assert rows[1] == 10.0 and rows[6] == -2.5
    assert rows[2] is None and rows[3] is None and rows[4] is None
    assert rows[5] is None


def test_cents_pipeline_clean_after_normalization(spark):
    # the exact-cents cast is the expression NaN kills in BOTH engines
    # (ANSI Spark throws CAST_INVALID_INPUT, DuckDB a Conversion Error);
    # after the boundary normalizer it NULL-skips like any aggregate
    df = finite_or_null(_frame(spark), "x")
    got = df.agg(F.sum(cents("x")).alias("s")).collect()[0].s
    assert got == 1000 + (-250)


def test_cents_pipeline_diverges_without_normalization(spark):
    # the raw-NaN failure mode is WORSE than a crash: Spark's
    # floor(double) silently maps NaN to 0 cents while DuckDB raises a
    # Conversion Error on the same expression — silent cross-engine
    # divergence; ±Inf meanwhile ANSI-throws on the Spark side. Both
    # are the class the finite-or-null boundary contract exists to
    # exclude (NANCHECK.json, 39/226 on raw NaN input).
    import duckdb

    nan_df = spark.createDataFrame(
        [(1, 10.0), (2, float("nan"))], "id long, x double"
    )
    got = nan_df.agg(F.sum(cents("x")).alias("s")).collect()[0].s
    assert got == 1000  # the NaN row silently contributed 0 cents

    # +Inf is silent garbage too: floor(double)->BIGINT saturates to
    # Long.MAX (and -Inf to Long.MIN, so a mixed sum ANSI-overflows)
    inf_df = spark.createDataFrame(
        [(1, float("inf"))], "id long, x double"
    )
    got_inf = inf_df.select(cents("x").alias("c")).collect()[0].c
    assert got_inf == (1 << 63) - 1

    con = duckdb.connect()
    with pytest.raises(Exception, match="(?i)conversion|cast|range"):
        con.execute(
            "SELECT sum(CAST(floor(x * 100 + 0.5) AS BIGINT)) "
            "FROM (VALUES (CAST('nan' AS DOUBLE))) t(x)"
        ).fetchall()


def _mini_fixture(tmpdir: str) -> None:
    """A tiny fixture dir with non-finite values in contract columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                "o_totalprice": pa.array(
                    [100.0, float("nan"), float("inf"), float("-inf")],
                    pa.float64(),
                ),
            }
        ),
        f"{tmpdir}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
                "embedding": pa.array(
                    [
                        [1.0, 2.0],
                        [float("nan"), 1.0],
                        [1.0, float("inf")],
                        None,
                    ],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        f"{tmpdir}/embeddings.parquet",
    )


def test_load_table_enforces_contract_on_scan(spark, tmp_path):
    # round 10 (VERDICT r9 item 3): the contract is no longer an
    # opt-in helper — the engine's OWN scan path normalizes, so raw
    # external NaN/±Inf cannot reach any operator
    from spring_and_kafka_spark.sources.tables import load_table

    _mini_fixture(str(tmp_path))
    rows = {
        r.o_orderkey: r.o_totalprice
        for r in load_table(spark, str(tmp_path), "orders").collect()
    }
    assert rows == {1: 100.0, 2: None, 3: None, 4: None}

    vecs = {
        r.vec_id: r.embedding
        for r in load_table(spark, str(tmp_path), "embeddings").collect()
    }
    # any non-finite component nulls the WHOLE vector (it would poison
    # every dot product / centroid / quantizer downstream), routing it
    # to the NULL-embedding admission path all consumers already handle
    assert vecs[1] == [1.0, 2.0]
    assert vecs[2] is None and vecs[3] is None and vecs[4] is None


def test_duckdb_contract_views_mirror_the_scan(spark, tmp_path):
    # the oracle side of the NaN sweep reads through the same boundary:
    # selfcheck --contract-views must produce exactly load_table's rows
    import duckdb

    from tools.selfcheck import _contract_view_sql

    _mini_fixture(str(tmp_path))
    con = duckdb.connect()
    con.execute(_contract_view_sql(str(tmp_path), "orders"))
    con.execute(_contract_view_sql(str(tmp_path), "embeddings"))
    assert con.execute(
        "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey"
    ).fetchall() == [(1, 100.0), (2, None), (3, None), (4, None)]
    got = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    assert got[0][1] == [1.0, 2.0]
    assert got[1][1] is None and got[2][1] is None and got[3][1] is None


def test_stream_reader_enforces_contract_on_raw_external_parquet(spark, tmp_path):
    # read_event_stream is the ingest boundary for streaming: staged
    # chunks are clean (they pass through load_table), but RAW external
    # parquet pointed at the reader must be normalized identically
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spring_and_kafka_spark.streaming.replay import (
        drain_to_memory,
        read_event_stream,
    )

    t0 = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(
                    [t0, t0, t0], pa.timestamp("us")
                ),
                "user_id": pa.array([7, 7, 7], pa.int64()),
                "value": pa.array(
                    [1.5, float("nan"), float("inf")], pa.float64()
                ),
            }
        ),
        f"{tmp_path}/chunk.parquet",
    )
    out = drain_to_memory(
        read_event_stream(spark, str(tmp_path)), "nan_stream_probe", spark
    )
    vals = {r.event_id: r.value for r in out.collect()}
    assert vals == {1: 1.5, 2: None, 3: None}


def test_aggregates_follow_null_path_after_normalization(spark):
    df = finite_or_null(_frame(spark), "x")
    row = df.agg(
        F.avg("x").alias("m"),
        F.count("x").alias("n_obs"),
        F.count("*").alias("n_rows"),
    ).collect()[0]
    assert row.n_rows == 6 and row.n_obs == 2
    assert not math.isnan(row.m)
    assert abs(row.m - 3.75) < 1e-12
