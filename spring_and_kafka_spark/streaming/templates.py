"""Streaming template-table maintenance: the ingest-side twin of
q_text_boilerplate. Documents arrive as a (replayed) stream; each
micro-batch folds its tumbling segments into three MERGEABLE partial
state tables (DESIGN.md item 17 — counters that merge by union, with
the non-mergeable readout derived at read time):

- ``pairs``:  distinct (seg, source) presence — the cross-source tally
  a segment needs to be flagged as a template is a DISTINCT count,
  which is not a foldable counter, so the state keeps the presence SET
  (bounded by segments × |sources|, not by document volume) and the
  flag derives on read;
- ``counts``: (source, seg, n) segment-instance sums — plainly
  mergeable; a batch of millions of docs lands as one row per touched
  (source, seg);
- ``docs``:   distinct (source, doc_id) presence for the n_docs
  readout. At 100 TB this table is the one worth sketching (HLL, the
  q_agg_hll_rollup primitive) — kept exact here so stream ≡ batch is
  bit-testable.

Read-time ``maintained_templates`` reproduces q_text_boilerplate's
output EXACTLY (same segment builder — llm.text.boilerplate_segments —
same sentinel, same floor-form rate), which
tests/test_streaming_advanced.py asserts after a full replay. The
batch detector re-decides every segment per run; this maintainer
absorbs a day's crawl without rescanning the corpus — the reason a
template table is maintained rather than recomputed at web scale.

Reference parity anchor: no streaming-curation surface in the
reference (src/main/java/jc/DemoApplication.java is a Kafka pipe) —
part of the beyond-the-reference LLM-data family, composed from the
reference's [R] stream-pipe shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spring_and_kafka_spark.llm.text import (
    _BP_MIN_SRC,
    _BP_NULL_SRC,
    boilerplate_segments,
)
from spring_and_kafka_spark.streaming.sinks import foreach_batch_sink

_PAIRS_SCHEMA = "seg STRING, source STRING"
_COUNTS_SCHEMA = "source STRING, seg STRING, n BIGINT"
_DOCS_SCHEMA = "source STRING, doc_id BIGINT"


def template_delta_stream(docs: DataFrame, state_dir: str):
    """Fold a document stream into per-batch template-state partials
    under ``state_dir`` (availableNow trigger — drains the staged
    corpus then stops, the replay harness convention)."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        # one cut per batch: three consumers below (the q_dedup_minhash
        # materialize lesson, applied per micro-batch); try/finally so a
        # failed write cannot leak the cached batch across retries (the
        # freshness.py on_batch convention)
        seg = boilerplate_segments(batch_df).persist()
        try:
            (
                seg.select("seg", "source")
                .distinct()
                .write.mode("overwrite")
                .parquet(f"{state_dir}/pairs/batch_id={batch_id}")
            )
            (
                seg.groupBy("source", "seg")
                .agg(F.count(F.lit(1)).alias("n"))
                .write.mode("overwrite")
                .parquet(f"{state_dir}/counts/batch_id={batch_id}")
            )
            (
                seg.select("source", "doc_id")
                .distinct()
                .write.mode("overwrite")
                .parquet(f"{state_dir}/docs/batch_id={batch_id}")
            )
        finally:
            seg.unpersist()

    return (
        foreach_batch_sink(docs, on_batch, state_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )


_SUBTABLES = (
    ("pairs", _PAIRS_SCHEMA),
    ("counts", _COUNTS_SCHEMA),
    ("docs", _DOCS_SCHEMA),
)


def _read_state(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Read the three partial tables, RAISING on torn state instead of
    silently absorbing it (the freshness.py guard, ADVICE r6 / round-7
    review: independent silent reads of sibling state tables are the
    bug shape — a crash between on_batch's three writes must surface,
    not zero out a report). Two levels: a top-level dir missing while a
    sibling exists (first-batch crash), and a batch_id=N partition
    present on some sides only (crash on any later batch — checked via
    Hadoop FS listing, driver-side metadata only)."""
    from pyspark.errors import AnalysisException

    def read_or_none(sub: str, schema: str) -> DataFrame | None:
        try:
            return spark.read.schema(schema).parquet(f"{state_dir}/{sub}")
        except AnalysisException:
            return None

    frames = {sub: read_or_none(sub, sch) for sub, sch in _SUBTABLES}
    present = [sub for sub, df in frames.items() if df is not None]
    if present and len(present) < len(_SUBTABLES):
        missing = [sub for sub, df in frames.items() if df is None]
        raise RuntimeError(
            f"partial template state under {state_dir}: {present} exist "
            f"but {missing} are missing — a crash between on_batch's "
            "three writes; replay the last batch or clear the state dir"
        )
    if not present:
        return tuple(
            spark.createDataFrame([], sch) for _, sch in _SUBTABLES
        )

    def batch_dirs(sub: str) -> set[str]:
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(f"{state_dir}/{sub}")
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        return {
            st.getPath().getName()
            for st in fs.listStatus(path)
            if st.getPath().getName().startswith("batch_id=")
        }

    sets = {sub: batch_dirs(sub) for sub, _ in _SUBTABLES}
    union = set().union(*sets.values())
    for sub, have in sets.items():
        torn = union - have
        if torn:
            raise RuntimeError(
                f"partial template state under {state_dir}: "
                f"{sorted(torn)[0]} missing from {sub}/ — a crash "
                "between on_batch's three writes; replay that batch or "
                "clear the state dir"
            )
    return tuple(frames[sub] for sub, _ in _SUBTABLES)


def maintained_templates(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current per-source boilerplate report from the accumulated
    partials — column-identical to q_text_boilerplate's batch output.
    Distinct-presence tables dedup across batches by a read-time
    distinct over the PROJECTED presence columns (reading partitioned
    partials appends the batch_id partition column even when the user
    schema omits it, so distinct() before the projection would key on
    batch_id and double-count a document or pair re-seen in a later
    batch — the review finding that motivated both .select()s below);
    instance counts merge by sum."""
    pairs, counts, docs = _read_state(spark, state_dir)
    flag = (
        pairs.select("seg", "source")
        .distinct()
        .groupBy("seg")
        .agg(
            (
                F.count_distinct(F.coalesce("source", F.lit(_BP_NULL_SRC)))
                >= _BP_MIN_SRC
            ).alias("boiler")
        )
    )
    seg_totals = counts.groupBy("source", "seg").agg(F.sum("n").alias("n"))
    n_docs = (
        docs.select("source", "doc_id")
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    per_src = (
        seg_totals.join(flag, "seg")
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_segments"),
            F.sum(F.when(F.col("boiler"), F.col("n")).otherwise(0)).alias(
                "n_boiler"
            ),
        )
    )
    return (
        per_src.join(n_docs, per_src["source"].eqNullSafe(n_docs["source"]))
        .drop(n_docs["source"])
        .select(
            "source",
            "n_docs",
            "n_segments",
            "n_boiler",
            (
                F.floor(
                    F.col("n_boiler") * 1e6 / F.col("n_segments") + F.lit(0.5)
                )
                / 1e6
            ).alias("boiler_rate"),
        )
    )
