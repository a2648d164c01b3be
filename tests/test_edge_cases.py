"""Edge-case micro-fixtures (SURVEY.md §5.2): null keys, empty inputs,
duplicate keys, top-k ties, empty arrays, malformed JSON."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from spring_and_kafka_spark.llm.similarity import cosine

from .conftest import SF_SMOKE


def test_join_null_keys_dont_match(spark):
    schema = "k INT, v STRING"
    left = spark.createDataFrame([(1, "a"), (None, "b")], schema)
    right = spark.createDataFrame([(1, "x"), (None, "y")], schema)
    out = left.join(right, "k").collect()
    assert len(out) == 1  # null keys never equi-join


def test_null_safe_join_matches_nulls(spark):
    schema = "k INT, v STRING"
    left = spark.createDataFrame([(1, "a"), (None, "b")], schema)
    right = spark.createDataFrame([(1, "x"), (None, "y")], schema)
    out = left.join(right, left.k.eqNullSafe(right.k)).collect()
    assert len(out) == 2  # eqNullSafe pairs the nulls


def test_agg_on_empty_input(spark):
    empty = spark.createDataFrame([], "k STRING, v DOUBLE")
    row = empty.agg(
        F.count("*").alias("n"), F.sum("v").alias("s"), F.avg("v").alias("a")
    ).collect()[0]
    assert (row["n"], row["s"], row["a"]) == (0, None, None)
    assert empty.groupBy("k").count().collect() == []  # no groups, no rows


def test_topk_tie_break_deterministic(spark):
    rows = [(1, 10.0, "a"), (1, 10.0, "b"), (1, 10.0, "c")]
    df = spark.createDataFrame(rows, "g INT, score DOUBLE, id STRING")
    w = W.partitionBy("g").orderBy(F.col("score").desc(), "id")
    top2 = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    got = sorted(r["id"] for r in top2.collect())
    assert got == ["a", "b"]  # unique tie-break key → stable winners


def test_cosine_empty_and_zero_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]), (2, [1.0, 0.0], [0.0, 1.0])],
        "id INT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )
    out = {r["id"]: r["c"] for r in df.select("id", cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert out[1] == 1.0 and out[2] == 0.0


def test_malformed_json_yields_null(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "not json"), (3, None)], "id INT, props STRING"
    )
    out = {
        r["id"]: r["k"]
        for r in df.select(
            "id", F.get_json_object("props", "$.k").cast("long").alias("k")
        ).collect()
    }
    assert out == {1: 5, 2: None, 3: None}


def test_explode_empty_array_drops_vs_outer_keeps(spark):
    df = spark.createDataFrame([(1, ["a"]), (2, [])], "id INT, xs ARRAY<STRING>")
    plain = df.select("id", F.explode("xs")).collect()
    outer = df.select("id", F.explode_outer("xs")).collect()
    assert len(plain) == 1
    assert len(outer) == 2  # empty-array row survives with null


def test_dedup_with_null_keys(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (1, 3)], "k INT, v INT"
    )
    w = W.partitionBy("k").orderBy("v")
    out = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    got = {(r["k"], r["v"]) for r in out.collect()}
    assert got == {(None, 1), (1, 3)}  # nulls form one dedup group


def test_dedup_path_tolerates_null_and_empty_text(spark):
    """A 100 TB corpus has null/empty text rows; the dedup path must drop
    them from pair generation without crashing (split(NULL) -> NULL array,
    explode(NULL) -> no rows, in both engines)."""
    from spring_and_kafka_spark.llm.dedup import (
        lsh_verified_pairs,
        ngram_jaccard_pairs,
        shingles,
    )

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h i"),  # near-dup of 1
            (3, None),
            (4, ""),
            (5, "x"),  # single token -> one degenerate shingle
        ],
        "doc_id LONG, text STRING",
    )
    sh_ids = {r["doc_id"] for r in shingles(corpus, 3).collect()}
    assert 3 not in sh_ids  # null text contributes no shingles
    exact = {
        (r["a_id"], r["b_id"])
        for r in ngram_jaccard_pairs(corpus, 3, 0.5).collect()
    }
    assert exact == {(1, 2)}
    lsh = {
        (r["a_id"], r["b_id"])
        for r in lsh_verified_pairs(corpus, 3, 0.5).collect()
    }
    assert lsh == {(1, 2)}


def test_ts_anomaly_integer_frame_headroom(spark):
    """q_ts_anomaly's determinism rests on exact BIGINT frame sums; assert
    the worst-case sum(vi*vi) over a 20-row frame stays inside int64 at
    the LARGEST fixture scale (ANSI Spark would throw loudly past it, but
    the margin itself is the claim worth pinning)."""
    from spring_and_kafka_spark.operators.timeseries import _ANOM_WIN
    from spring_and_kafka_spark.sources.tables import load_table

    vmax = (
        load_table(spark, "/root/testdata/sf0.1", "events")
        .agg(F.max("value"))
        .first()[0]
    )
    vi_max = int(vmax * 1e6 + 0.5)
    assert vi_max * vi_max * _ANOM_WIN < 2**63 * 0.9


def test_ts_resample_open_close_respect_time_order(spark):
    """Per (user, bucket): open is the value of the earliest event and
    close the latest (event_id tie-break), verified against a window
    formulation on the raw table."""
    from spring_and_kafka_spark import registry
    from spring_and_kafka_spark.sources.tables import load_table

    out = {
        (r["user_id"], r["bucket"]): r
        for r in registry.all_specs()["q_ts_resample"]
        .fn(spark, SF_SMOKE)
        .collect()
    }
    e = load_table(spark, SF_SMOKE, "events").selectExpr(
        "user_id",
        "CAST(unix_micros(to_utc_timestamp(ts, 'UTC')) / 21600000000 AS LONG) AS bucket",
        "ts",
        "event_id",
        "value",
    )
    rows = e.collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[(r["user_id"], r["bucket"])].append(r)
    assert set(groups) == set(out)
    for k, g in groups.items():
        g.sort(key=lambda r: (r["ts"], r["event_id"]))
        assert out[k]["open"] == g[0]["value"]
        assert out[k]["close"] == g[-1]["value"]
        assert out[k]["n"] == len(g)


def test_pagerank_mass_and_spread(spark):
    """Integer PageRank sanity: every rank >= the damping base, the
    distribution is non-degenerate (co-purchase hubs rise), and total
    mass stays below the initial total (integer div only leaks mass
    downward, never creates it)."""
    from spring_and_kafka_spark import registry
    from spring_and_kafka_spark.operators.graph import _PR_BASE, _PR_SCALE

    rows = registry.all_specs()["q_graph_pagerank"].fn(spark, SF_SMOKE).collect()
    prs = [r["pr"] for r in rows]
    assert min(prs) >= _PR_BASE
    assert max(prs) > min(prs)
    assert sum(prs) <= _PR_SCALE * len(prs)


def test_peak_from_intervals_degenerate_shapes(spark):
    """Single interval, zero-length intervals, and exact-duplicate
    intervals all sweep correctly (closed-interval semantics: identical
    instants stack)."""
    from spring_and_kafka_spark.operators.analytics import peak_from_intervals

    one = spark.createDataFrame([(5, 5)], "s long, e long")
    r = peak_from_intervals(one).collect()[0]
    assert (r.peak_concurrency, r.peak_ts_micros) == (1, 5)

    dups = spark.createDataFrame([(10, 20)] * 3 + [(20, 20)], "s long, e long")
    r = peak_from_intervals(dups).collect()[0]
    assert (r.peak_concurrency, r.peak_ts_micros) == (4, 20)


def test_quantile_sketch_single_value_multiset(spark):
    """A one-point distribution: every quantile resolves to that point's
    bucket with zero rank ambiguity."""
    from spring_and_kafka_spark.operators.sketches import (
        decimal_histogram,
        select_quantile_buckets,
    )

    df = spark.createDataFrame([(12345,)] * 7, "cents long")
    rows = select_quantile_buckets(spark, decimal_histogram(df)).collect()
    assert len(rows) == 3
    for r in rows:
        assert (r.digits, r.first2) == (5, 12)
        assert r.r <= 7 and r.below == 0


def test_cusum_identity_on_synthetic_burst(spark):
    """The prefix-sum/running-min identity reproduces the textbook
    recurrence on a hand-checkable series: drift decays to zero between
    bursts and accumulates across a burst."""
    import pandas as pd

    from spring_and_kafka_spark.streaming.stateful import _update_cusum

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    # deviations: burst of +3, then -10 washes S back to 0, then +2
    pdf = pd.DataFrame(
        {
            "us": range(6),
            "event_id": range(6),
            "d": [3, 3, 3, -10, 2, 2],
        }
    )
    st = FakeState()
    out = list(_update_cusum(("t",), iter([pdf]), st))[0]
    # S: 3,6,9,0(clamp),2,4 → max 9, no alarm at h=2e8
    assert out.loc[0, "max_cusum_micros"] == 9
    assert out.loc[0, "n_alarms"] == 0
    assert st.value[0] == 3  # prefix sum of all d: 3+3+3-10+2+2
    assert st.value[1] == -1  # running min prefix (P after the -10)


def test_holt_tracks_a_perfect_linear_series(spark, tmp_path):
    """On x_i = 5i the Holt smoother must converge: trend -> the true
    slope 5 and the one-step forecast -> the next value — the property
    EWMA structurally cannot have (it lags a trending series forever).
    Driven through the real query against a synthetic events table."""
    import datetime as dt

    from spring_and_kafka_spark.operators.timeseries import q_ts_holt

    rows = [
        (
            i,
            dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
            7,
            float(5 * i),
            "t",
            "{}",
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, value double, "
        "event_type string, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        q_ts_holt(spark, str(tmp_path)).collect(),
        key=lambda r: r["event_id"],
    )
    last = out[-1]
    assert abs(last["trend"] - 5.0) < 0.01
    assert abs(last["forecast"] - 5.0 * 60) < 0.05
    # level tracks the series itself once converged
    assert abs(last["level"] - last["value"]) < 0.05


def test_ols2_matches_numpy_least_squares(spark):
    """The closed-form normal-equation solve (one aggregation pass +
    Cramer algebra) must agree with numpy's QR-based lstsq on the same
    integer-scaled design matrix — two entirely different solution
    paths, same betas."""
    import numpy as np

    from spring_and_kafka_spark.operators.aggregates import q_agg_ols2
    from spring_and_kafka_spark.sources.tables import load_table

    got = q_agg_ols2(spark, SF_SMOKE).collect()[0]
    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    x1 = np.array([float(int(r[0])) for r in rows])
    x2 = np.array([np.floor(r[1] * 100 + 0.5) for r in rows])
    y = np.array([np.floor(r[2] * 100 + 0.5) for r in rows])
    A = np.column_stack([np.ones_like(x1), x1, x2])
    beta = np.linalg.lstsq(A, y, rcond=None)[0]
    assert got["n_rows"] == len(rows)
    assert abs(got["beta_qty"] - beta[1] / 100) < 1e-3
    assert abs(got["beta_disc_pct"] - beta[2] / 100) < 1e-3


def test_dist_shift_probabilities_sum_to_one_and_jsd_bounded(spark):
    """Laplace-smoothed per-period probabilities must each sum to 1
    (modulo rounding), per-type JS terms are non-negative, and the total
    JSD is bounded by 1 bit — the invariants that make the drift number
    comparable across ingests."""
    from spring_and_kafka_spark.operators.profiling import q_dist_shift

    rows = q_dist_shift(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    assert abs(sum(r["p_early"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["p_late"] for r in rows) - 1.0) < 1e-3
    jsd = sum(r["js_term"] for r in rows)
    assert 0.0 <= jsd <= 1.0
    for r in rows:
        assert r["js_term"] >= 0.0


def test_gini_bounds_and_degenerate_equality(spark, tmp_path):
    """Gini must be 0 on perfectly equal revenues, approach (n-1)/n when
    one customer holds everything, and the fixture value must fall
    strictly inside (0, 1)."""
    from spring_and_kafka_spark.operators.profiling import q_agg_gini

    fixture = q_agg_gini(spark, SF_SMOKE).collect()[0]
    assert 0.0 < fixture["gini"] < 1.0

    import datetime as dt

    def write_orders(rows, name):
        df = spark.createDataFrame(
            [
                (i, ck, "O", price, dt.datetime(2024, 1, 1), "1-URGENT")
                for i, (ck, price) in enumerate(rows)
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string",
        )
        d = tmp_path / name
        df.write.mode("overwrite").parquet(str(d / "orders.parquet"))
        return str(d)

    equal = write_orders([(c, 100.0) for c in range(10)], "equal")
    assert q_agg_gini(spark, equal).collect()[0]["gini"] == 0.0
    skewed = write_orders(
        [(0, 1e6)] + [(c, 0.01) for c in range(1, 10)], "skewed"
    )
    assert q_agg_gini(spark, skewed).collect()[0]["gini"] > 0.85


def test_funnel_latency_gaps_are_positive_and_match_funnel_counts(spark):
    """Each transition's user count must equal q_funnel's corresponding
    stage count (both now derive from funnel_stage_minima — one stage
    definition, two readouts), with positive latencies and p50 <= p90."""
    from spring_and_kafka_spark.operators.analytics import (
        q_funnel,
        q_funnel_latency,
    )

    lat = {r["step"]: r for r in q_funnel_latency(spark, SF_SMOKE).collect()}
    assert set(lat) == {"signup_to_click", "click_to_purchase"}
    for r in lat.values():
        assert r["n_users"] > 0
        assert 0 < r["p50_sec"] <= r["p90_sec"]
    # q_funnel returns ONE wide row: (n_signup, n_click_after,
    # n_purchase_after) — compare stage-by-stage BY NAME
    funnel = q_funnel(spark, SF_SMOKE).collect()[0]
    assert lat["signup_to_click"]["n_users"] == funnel["n_click_after"]
    assert lat["click_to_purchase"]["n_users"] == funnel["n_purchase_after"]


def test_pareto_abc_partitions_and_ordering(spark):
    """A/B/C shares must sum to 1, stack as A>=~50%, A+B>=~80%, and
    every customer lands in exactly one class."""
    import pyspark.sql.functions as F

    from spring_and_kafka_spark.operators.profiling import q_pareto_abc
    from spring_and_kafka_spark.sources.tables import load_table

    rows = {r["abc_class"]: r for r in q_pareto_abc(spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_cust = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows.values()) == n_cust
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 1e-3
    # boundary rows belong to the class whose threshold they complete,
    # so A can land just under 50% and A+B just under 80%
    assert rows["A"]["revenue_share"] <= 0.5
    assert rows["A"]["revenue_share"] + rows["B"]["revenue_share"] <= 0.8
    # A takes the LARGEST customers first, so its mean revenue per
    # customer must dominate C's — true even on TPC-H's near-uniform
    # revenue, where the class sizes themselves are nearly equal
    mean_a = rows["A"]["revenue"] / rows["A"]["n_customers"]
    mean_c = rows["C"]["revenue"] / rows["C"]["n_customers"]
    assert mean_a > mean_c


def test_empty_rollup_carveout_boundary():
    """Pin the empty-sweep rollup carve-out's EXACT boundary (r14
    verdict process note): the accepted divergence is the four
    rollup-family queries at precisely (spark=0, oracle=1) rows with
    identical column sets — nothing else. If either the allowlist or
    the predicate silently widens, this fails."""
    from tools.empty_sweep import (
        EXPECTED_EMPTY_DIVERGENCE,
        accept_empty_rollup_divergence as ok,
    )

    assert EXPECTED_EMPTY_DIVERGENCE == {
        "q_rollup",
        "q_rollup_grouping",
        "q_cube",
        "q_grouping_sets",
    }
    cols = ["a", "b"]
    for name in sorted(EXPECTED_EMPTY_DIVERGENCE):
        assert ok(name, cols, ["b", "a"], 0, 1)  # the one accepted shape
        assert not ok(name, cols, cols, 0, 2)  # extra oracle rows
        assert not ok(name, cols, cols, 1, 1)  # spark emitted rows
        assert not ok(name, cols, cols, 0, 0)  # both empty = plain match path
        assert not ok(name, cols, ["a", "c"], 0, 1)  # column drift
    assert not ok("q_agg_group", cols, cols, 0, 1)  # not in the allowlist


def test_empty_rollup_divergence_is_real(spark, tmp_path):
    """Pin the ENGINE SEMANTICS the carve-out models: over an empty
    relation Spark's rollup() emits 0 rows while standard SQL GROUP BY
    ROLLUP emits the grand-total row (DuckDB: 1 row). If a Spark
    upgrade ever aligns with the standard, this fails and the
    carve-out must be deleted rather than left to mask a regression."""
    import duckdb

    from spring_and_kafka_spark import registry

    d = tmp_path / "empty-rollup"
    d.mkdir()
    for t in ("customer", "nation", "region"):
        schema = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").schema
        spark.createDataFrame([], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"{t}.parquet"))
    spec = registry.all_specs()["q_rollup"]
    assert spec.fn(spark, str(d)).count() == 0
    con = duckdb.connect()
    for t in ("customer", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    orows = con.execute(spec.oracle).fetchall()
    assert len(orows) == 1  # the grand-total grouping row
