"""Streaming sinks (SURVEY.md §2.1/§2.8): the reference's terminal `log`
sink and per-batch callback generalized.

Reference anchors: the consumer's terminal handle lambda logging each
(topic, records) entry (reference: src/main/java/jc/DemoApplication.java:154-157)
and the Spring XD `… | log` sink (reference: README.md:331,336).
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame

_LOG = logging.getLogger(__name__)


def log_sink(stream_df: DataFrame, checkpoint_dir: str | None = None, num_rows: int = 20):
    """`| log`: print each micro-batch to the console (bounded rows)."""
    w = stream_df.writeStream.format("console").option("numRows", str(num_rows))
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w


def foreach_batch_sink(
    stream_df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
):
    """The generalized per-batch handle: fn(batch_df, batch_id) runs once
    per micro-batch with a BATCH DataFrame — the escape hatch for sinks
    Spark lacks (JDBC upserts, dual-writes), with exactly-once achieved by
    making fn idempotent on batch_id."""
    w = stream_df.writeStream.foreachBatch(fn)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w


def parquet_sink(stream_df: DataFrame, path: str, checkpoint_dir: str):
    """File sink with exactly-once semantics via the checkpoint WAL (the
    offset-commit analog of reference: src/main/java/jc/DemoApplication.java:144)."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
    )


def _batch_partitions(spark, table_dir: str) -> tuple[set[str], set[str]]:
    """(committed, uncommitted) ``batch_id=N`` partition names under one
    state table dir, by driver-side Hadoop FS metadata listing (works on
    object stores, never a Spark job). Committed = the partition carries
    its ``_SUCCESS`` marker."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(table_dir)
    fs = path.getFileSystem(conf)
    done: set[str] = set()
    torn: set[str] = set()
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not name.startswith("batch_id="):
            continue
        ok = fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{table_dir}/{name}/_SUCCESS")
        )
        (done if ok else torn).add(name)
    return done, torn


def read_single_state(
    spark,
    state_dir: str,
    schema: str,
    what: str,
    require_success: bool = True,
):
    """Single-table variant of :func:`read_partial_state` for
    maintainers whose state is a flat ``{state_dir}/batch_id=N`` layout
    (streaming/mv.py, sketch.py, drift.py — the migration the r15
    guard's docstring named as the standing cleanup): the sibling-table
    tear levels are vacuous with one table, so only the level-3 check
    applies — a ``batch_id=N`` partition WITHOUT its ``_SUCCESS``
    marker is a crash DURING that write (the dir exists from job
    start, so the bare read absorbs partial data silently) and RAISES.
    Returns an empty frame when the state dir doesn't exist (the
    stream simply never ran).

    ``require_success=False`` skips the marker check — for deployments
    whose committer writes no markers
    (``mapreduce.fileoutputcommitter.marksuccessfuljobs=false``, the
    common object-store-committer setting — ADVICE r15): tear
    detection then degrades to the replay-overwrite contract alone
    (exactly the pre-guard behavior), but the degradation is chosen
    EXPLICITLY by the caller instead of silently being the only mode.
    The default assumes markers, which Spark's parquet batch writes
    under ``foreachBatch`` produce out of the box."""
    from pyspark.errors import AnalysisException

    try:
        frame = spark.read.schema(schema).parquet(state_dir)
    except AnalysisException:  # no batch ever committed a partition
        return spark.createDataFrame([], schema)
    _, torn = _batch_partitions(spark, state_dir)
    if torn:
        if require_success:
            raise RuntimeError(
                f"partial {what} state under {state_dir}: "
                f"{sorted(torn)[0]} has no _SUCCESS marker — a crash "
                "during that write; replay that batch or clear the "
                "state dir"
            )
        # markerless-committer mode: a marker-less partition is expected,
        # but it is also exactly what a mid-write crash leaves behind —
        # log so operators can tell the two apart (ADVICE r16)
        _LOG.warning(
            "%s state under %s: merging %d marker-less batch "
            "partition(s) (%s ...) under require_success=False — "
            "expected for markerless committers, but indistinguishable "
            "from a mid-write crash; tear detection degrades to the "
            "replay-overwrite contract",
            what,
            state_dir,
            len(torn),
            sorted(torn)[0],
        )
    return frame


def read_partial_state(
    spark, state_dir: str, subtables, what: str, require_success: bool = True
):
    """Read a merge-on-read maintainer's partial state tables, RAISING
    on torn state instead of silently absorbing it (the freshness.py
    guard generalized to N sibling tables — ADVICE r6 / round-7 review:
    independent silent reads of sibling state are the bug shape).

    ``subtables`` is a list of (name, schema) pairs; returns a tuple of
    DataFrames in the same order (all empty when NO table exists — the
    stream simply never ran). Three tear levels are checked:

    1. a top-level table dir missing while a sibling exists — a crash
       between a batch's first and later writes on the FIRST batch;
    2. a ``batch_id=N`` partition present under some tables only — the
       same crash on any later batch;
    3. a ``batch_id=N`` partition WITHOUT its ``_SUCCESS`` marker — a
       crash DURING that write (the dir exists from job start, so bare
       dir-presence checks pass while the data inside is partial; the
       r15 review found this evasion in the first templates guard).
       Skippable via ``require_success=False`` for committers that
       write no markers (see :func:`read_single_state`); levels 1-2
       still apply.

    All checks are driver-side Hadoop FS metadata listings (works on
    object stores), never a Spark job. Single-table maintainers
    (streaming/mv.py, sketch.py, drift.py) read the flat-layout twin
    :func:`read_single_state` (the r15 standing cleanup, closed r16)."""
    from pyspark.errors import AnalysisException

    def read_or_none(sub: str, schema: str) -> DataFrame | None:
        try:
            return spark.read.schema(schema).parquet(f"{state_dir}/{sub}")
        except AnalysisException:
            return None

    frames = {sub: read_or_none(sub, sch) for sub, sch in subtables}
    present = [sub for sub, df in frames.items() if df is not None]
    if present and len(present) < len(subtables):
        missing = [sub for sub, df in frames.items() if df is None]
        raise RuntimeError(
            f"partial {what} state under {state_dir}: {present} exist "
            f"but {missing} are missing — a crash between on_batch's "
            "writes; replay the last batch or clear the state dir"
        )
    if not present:
        return tuple(
            spark.createDataFrame([], sch) for _, sch in subtables
        )

    sets = {}
    for sub, _ in subtables:
        done, torn = _batch_partitions(spark, f"{state_dir}/{sub}")
        if torn and require_success:
            raise RuntimeError(
                f"partial {what} state under {state_dir}: "
                f"{sorted(torn)[0]} under {sub}/ has no _SUCCESS marker "
                "— a crash during that write; replay that batch or "
                "clear the state dir"
            )
        # with markers disabled, a marker-less partition is simply a
        # batch (the committer never wrote markers) — include it in the
        # sibling-alignment check rather than treating it as torn, but
        # log it: a mid-write crash looks identical (ADVICE r16)
        if torn and not require_success:
            _LOG.warning(
                "%s state under %s/%s: merging %d marker-less batch "
                "partition(s) (%s ...) under require_success=False — "
                "expected for markerless committers, but "
                "indistinguishable from a mid-write crash",
                what,
                state_dir,
                sub,
                len(torn),
                sorted(torn)[0],
            )
        sets[sub] = done if require_success else (done | torn)
    union = set().union(*sets.values())
    for sub, _ in subtables:
        missing = union - sets[sub]
        if missing:
            b = sorted(missing)[0]
            haves = [s for s, have in sets.items() if b in have]
            raise RuntimeError(
                f"partial {what} state under {state_dir}: {b} has "
                f"{'/, '.join(haves)}/ but not {sub}/ — a crash "
                "between on_batch's writes; replay that batch or clear "
                "the state dir"
            )
    return tuple(frames[sub] for sub, _ in subtables)
