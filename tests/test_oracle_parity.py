"""Oracle differential tests (SURVEY.md §5.2 primary strategy): every
SQL-expressible query must match DuckDB on row count + columns + an
order-insensitive multiset of normalized values, at sf0.001 (the fast
tier; tools/selfcheck.py runs the same at sf0.01, the driver's scale)."""

from __future__ import annotations

import math

import pytest

from spring_and_kafka_spark import registry

from .conftest import SF_SMOKE

SPECS = registry.all_specs()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_SMOKE)
    # Driver-harness shape contract: the driver's pandas-based value
    # hasher cannot factorize complex cells, so no registered query may
    # output ARRAY/MAP/STRUCT columns — serialize them (concat_ws /
    # array_join, the q_agg_collect precedent). This bit twice before
    # becoming a test: r1 q_agg_collect, r5 q_text_inverted_index.
    from pyspark.sql import types as T

    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name} outputs complex-typed columns {complex_cols}; "
        "serialize to scalars (see q_agg_collect)"
    )
    srows = sdf.collect()
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only contract: runs and returns
        return
    res = duck.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _multiset(srows, sdf.columns) == _multiset(orows, ocols)
