"""Streaming sinks (SURVEY.md §2.1/§2.8): the reference's terminal `log`
sink and per-batch callback generalized.

Reference anchors: the consumer's terminal handle lambda logging each
(topic, records) entry (reference: src/main/java/jc/DemoApplication.java:154-157)
and the Spring XD `… | log` sink (reference: README.md:331,336).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


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


def read_partial_state(spark, state_dir: str, subtables, what: str):
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

    All checks are driver-side Hadoop FS metadata listings (works on
    object stores), never a Spark job. Single-table maintainers
    (streaming/mv.py, sketch.py, drift.py) still read their state
    directly and tolerate a level-3 torn batch silently — migrating
    them here is the standing cleanup."""
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

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def batch_dirs(sub: str) -> tuple[set[str], set[str]]:
        """(committed, uncommitted) batch_id=N partition names."""
        path = jvm.org.apache.hadoop.fs.Path(f"{state_dir}/{sub}")
        fs = path.getFileSystem(conf)
        done: set[str] = set()
        torn: set[str] = set()
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if not name.startswith("batch_id="):
                continue
            ok = fs.exists(
                jvm.org.apache.hadoop.fs.Path(
                    f"{state_dir}/{sub}/{name}/_SUCCESS"
                )
            )
            (done if ok else torn).add(name)
        return done, torn

    sets = {}
    for sub, _ in subtables:
        done, torn = batch_dirs(sub)
        if torn:
            raise RuntimeError(
                f"partial {what} state under {state_dir}: "
                f"{sorted(torn)[0]} under {sub}/ has no _SUCCESS marker "
                "— a crash during that write; replay that batch or "
                "clear the state dir"
            )
        sets[sub] = done
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
