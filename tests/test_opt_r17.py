"""Round-17 optimization equivalence pins.

Each r17 rewrite replaced a join/union-shaped subplan with an
algebraically identical cheaper form. These tests pin the equivalence
DIRECTLY — new form vs a locally re-built reference implementation of
the old form — on fixture data plus a NULL-bearing micro frame, so a
future edit to either side cannot silently diverge them. (The oracle
hash sweeps cover the composed queries; these cover the extracted
builders, including paths the fixtures only lightly exercise.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spring_and_kafka_spark.exec_utils import materialize, spread
from spring_and_kafka_spark.llm.dedup import (
    _MINHASH_PERMS,
    _SHINGLE_DF_CAP,
    _doc_features,
    lsh_candidate_pairs,
    planted_corpus,
    shingles,
)
from spring_and_kafka_spark.operators.graph import _co_order_pairs, _sym_edges
from spring_and_kafka_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _co_order_und_reference(li):
    """The pre-r17 build: distinct (order, part) items + self-join."""
    items = li.distinct()
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .select("u", "v")
    )


def test_co_order_pairs_match_self_join_reference(spark):
    # full thinned edge set: per-order array expansion == items self-join
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    new = (
        _co_order_pairs(spark, SF)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .select("u", "v")
    )
    assert _rows(new) == _rows(_co_order_und_reference(li))


def test_co_order_pairs_null_keys_never_pair(spark):
    # NULL order keys must not group together; NULL part keys must not
    # pair — exactly the join form's null semantics (NULLCHECK class)
    df = spark.createDataFrame(
        [
            (None, 1),
            (None, 2),  # null order: the old join never matched these
            (10, None),
            (10, 3),
            (10, 4),  # null part: dropped by < / collect_set
            (11, 3),
            (11, 4),
        ],
        "l_orderkey bigint, l_partkey bigint",
    )
    per_order = (
        df.filter(F.col("l_orderkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    ps = F.col("ps")
    pair_arr = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + F.lit(2), F.size(ps)),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    new = _rows(per_order.select(F.explode(pair_arr).alias("p")).select("p.u", "p.v"))
    a, b = df.alias("a"), df.alias("b")
    old = _rows(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        ).select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
    )
    assert new == old == [(3, 4), (3, 4)]


def test_sym_edges_matches_union_form(spark):
    eh = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "u bigint, v bigint")
    new = _rows(_sym_edges(eh))
    old = _rows(
        eh.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
            eh.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
    )
    assert new == old


def test_lsh_candidate_pairs_match_bucket_join_reference(spark):
    # grouped in-array pair expansion == the bucket self-join it replaced
    corpus = planted_corpus(spark, SF)
    docfeat = _doc_features(corpus, 3, _SHINGLE_DF_CAP)
    sig = docfeat.select("doc_id", "mh")
    new = _rows(lsh_candidate_pairs(sig, 16, 2, bucket_cap=500))

    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",", *[F.col("mh")[i * 2 + r] for r in range(2)]
                    )
                ).alias("bucket"),
            )
            for i in range(16)
        ]
    )
    buckets = materialize(
        sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
            "doc_id",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
    )
    counts = buckets.groupBy("band", "bucket").agg(F.count("*").alias("n"))
    cool = counts.filter(F.col("n") <= 500).select("band", "bucket")
    a, b = buckets.alias("a"), buckets.alias("b")
    old = _rows(
        a.join(F.broadcast(cool), ["band", "bucket"])
        .alias("a")
        .join(
            b.join(F.broadcast(cool), ["band", "bucket"]).alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    assert new == old and len(new) > 0


def test_lsh_candidate_pairs_bucket_cap_drops_hot_buckets(spark):
    # a 3-doc bucket survives cap 3 and is dropped at cap 2, and the
    # stats dict reports the over-cap bucket — the grouped form keeps
    # the old form's cap-and-observability contract
    sig = spark.createDataFrame(
        [(i, [7, 7]) for i in range(3)] + [(10, [1, 2]), (11, [1, 2])],
        "doc_id bigint, mh array<bigint>",
    )
    loose = _rows(lsh_candidate_pairs(sig, 1, 2, bucket_cap=3))
    assert (0, 1) in loose and (10, 11) in loose and len(loose) == 4
    stats: dict = {}
    tight = _rows(lsh_candidate_pairs(sig, 1, 2, bucket_cap=2, stats=stats))
    assert tight == [(10, 11)]
    assert stats["hot_buckets"] == 1 and stats["docs_in_hot_buckets"] == 3


def test_doc_features_window_df_matches_hot_join_reference(spark):
    # window doc-frequency == materialize + over-cap broadcast anti-join
    corpus = planted_corpus(spark, SF)
    new = _doc_features(corpus, 3, _SHINGLE_DF_CAP).select(
        "doc_id", "mh", "n", "hs"
    )

    sh = materialize(
        shingles(spread(corpus), 3).select(
            "doc_id", F.xxhash64("shingle").alias("s64")
        )
    )
    hot = (
        sh.groupBy("s64")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > _SHINGLE_DF_CAP)
        .select("s64", F.lit(True).alias("__hot"))
    )
    shx = sh.join(F.broadcast(hot), "s64", "left")
    old = shx.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("s64"))).alias(f"mh{i}")
            for i in range(_MINHASH_PERMS)
        ],
        F.count("*").alias("n"),
        F.sort_array(
            F.collect_set(F.when(F.col("__hot").isNull(), F.col("s64")))
        ).alias("hs"),
    ).select(
        "doc_id",
        F.array(*[f"mh{i}" for i in range(_MINHASH_PERMS)]).alias("mh"),
        "n",
        "hs",
    )
    assert _rows(new) == _rows(old)


def test_doc_features_window_df_cap_fires_identically(spark):
    # tiny cap forces the df guard to FIRE: the window form must drop
    # exactly the shingles the hot-join form dropped (fixture caps are
    # inert, so this path needs its own exercise)
    corpus = planted_corpus(spark, SF)
    cap = 2
    new = _doc_features(corpus, 3, cap)
    sh = materialize(
        shingles(spread(corpus), 3).select(
            "doc_id", F.xxhash64("shingle").alias("s64")
        )
    )
    hot = (
        sh.groupBy("s64")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > cap)
        .select("s64", F.lit(True).alias("__hot"))
    )
    old = (
        sh.join(F.broadcast(hot), "s64", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sort_array(
                F.collect_set(F.when(F.col("__hot").isNull(), F.col("s64")))
            ).alias("hs"),
        )
    )
    assert _rows(new.select("doc_id", "n", "hs")) == _rows(old)
