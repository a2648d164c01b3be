"""Skew mitigation for large joins (SURVEY.md §4 scale rules).

Two layers of defense at 100 TB:

1. AQE skew-join splitting (on by default in session.py) — handles skew
   Spark can see at runtime.
2. Explicit key salting (this module) — for joins AQE can't fix, e.g. a
   shuffled join where one hot key dwarfs a partition, or aggregations
   with a dominant group. The fact side sprays each hot row to one of
   `salt_buckets` sub-keys; the dim side replicates each row to all
   sub-keys; results are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: fact rows get a deterministic salt in
    [0, salt_buckets); dim rows are replicated across every salt value, so
    a hot join key spreads over `salt_buckets` shuffle partitions instead
    of hammering one task.

    Replication cost is |dim| × salt_buckets — use for fact⋈dim shapes
    where dim is small-ish but too big (or too skew-sensitive) to
    broadcast. Results are identical to a plain inner/left join.

    Only inner and left joins are supported: under right/full outer an
    unmatched dim row would surface once per salt replica (salt_buckets
    duplicates), which no post-filter can repair without a second pass.

    The salt is derived from the fact row's own content (xxhash64 over all
    columns), never from monotonically_increasing_id(): a positional salt
    changes on task retry/stage recomputation, which can drop or duplicate
    rows mid-shuffle — the classic nondeterministic-repartition hazard.
    Content-hashing keeps retries bit-identical; rows identical in every
    column get the same salt, which only narrows spreading for exact
    duplicate rows."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}"
        )
    # hash only hashable column types (xxhash64 rejects MapType); exact
    # duplicate rows still collapse onto one salt — if the hot key's rows
    # are all identical the join is also trivially reducible upstream
    # (aggregate the duplicates first), which is the right fix there
    from pyspark.sql import types as T

    hashable = [
        f.name for f in fact.schema.fields if not isinstance(f.dataType, T.MapType)
    ]
    if not hashable:
        raise ValueError("salted_join needs at least one non-map fact column")
    salted_fact = fact.withColumn(
        "__salt",
        (F.abs(F.xxhash64(*[F.col(c) for c in hashable])) % salt_buckets).cast("int"),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    salted_dim = dim.select("*", salts)
    joined = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["__salt"] == salted_dim["__salt"]),
        how,
    )
    return joined.drop("__salt")


def salted_group_count(
    df: DataFrame, key: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase aggregation for a skewed group key: count per
    (key, salt) first — spreading the hot key across partitions — then
    re-aggregate per key. (Spark's partial aggregation already does this
    for algebraic aggregates; the explicit form matters for aggregates
    without map-side partials, e.g. exact collect/distinct shapes.)"""
    salted = df.withColumn(
        "__salt",
        (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % salt_buckets).cast("int"),
    )
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("n"))
