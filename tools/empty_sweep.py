"""Empty-input sweep: run EVERY registered query, and its DuckDB oracle,
against a fixture directory whose ten tables have the real schemas but
ZERO rows — the "empty partition day" every 100 TB ingest eventually
hands an operator. A query passes when both engines agree on the empty
answer (usually 0 rows; global aggregates may emit one NULL-ish row).

    python tools/empty_sweep.py [--json EMPTYCHECK.json]

Complements tools/selfcheck.py (fixture data) and
tests/test_degenerate.py (constant/zero/singular shapes).
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spring_and_kafka_spark import registry  # noqa: E402
from spring_and_kafka_spark.session import get_spark  # noqa: E402
from spring_and_kafka_spark.sources.tables import TABLES  # noqa: E402
from tools.selfcheck import row_multiset  # noqa: E402

SRC = "/root/testdata/sf0.001"

# Known engine-semantic divergence ON EMPTY INPUT ONLY (verified in
# this sweep's first run): standard SQL GROUP BY ROLLUP/CUBE/GROUPING
# SETS emits the grand-total grouping row over an empty relation
# (DuckDB: 1 row, aggregates over the empty set), while Spark's
# rollup()/cube()/grouping sets return 0 rows. This is Spark engine
# behavior, not a query defect — synthesizing the grand-total row with
# a union would double-plan the aggregate purely to mimic DuckDB on a
# case where the answer carries no information. Accepted as
# (spark_rows=0, oracle_rows=1) and nothing else.
EXPECTED_EMPTY_DIVERGENCE = {
    "q_rollup",
    "q_rollup_grouping",
    "q_cube",
    "q_grouping_sets",
}


def accept_empty_rollup_divergence(
    name: str, scols, ocols, n_spark: int, n_oracle: int
) -> bool:
    """THE special case, and the whole special case: one of the four
    rollup-family queries, identical column sets, Spark 0 rows vs
    DuckDB's lone grand-total row. Anything else — more rows, a column
    drift, any other query — falls through to the normal comparator.
    Factored out so tests/test_edge_cases.py can pin the predicate's
    exact boundary (r14 verdict process note: the carve-out must not
    silently widen)."""
    return (
        name in EXPECTED_EMPTY_DIVERGENCE
        and sorted(scols) == sorted(ocols)
        and n_spark == 0
        and n_oracle == 1
    )


def build_empty_dir(spark, limit: int = 0) -> str:
    """limit=0 → empty tables; limit=N → the N first rows of each table
    by its first column (deterministic; FK coherence not preserved, so
    joins legitimately thin out — the point is exercising n=1 paths
    like stddev/corr where engines disagree on NaN vs NULL)."""
    out = tempfile.mkdtemp(prefix="sks-empty-")
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if limit:
            part = df.orderBy(df.columns[0]).limit(limit)
        else:
            part = spark.createDataFrame([], df.schema)
        part.coalesce(1).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    return out


def main() -> int:
    json_path = None
    limit = 0
    args = sys.argv[1:]

    def flag_value(name: str) -> str | None:
        if name not in args:
            return None
        i = args.index(name)
        if i + 1 >= len(args):
            raise SystemExit(f"usage: empty_sweep.py [{name} VALUE] ...")
        return args[i + 1]

    json_path = flag_value("--json")
    limit = int(flag_value("--limit") or 0)
    spark = get_spark("empty-sweep")
    d = build_empty_dir(spark, limit)
    import atexit
    import shutil

    atexit.register(shutil.rmtree, d, True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'"
        )
    failures: list[str] = []
    results: dict[str, dict] = {}
    for name, spec in sorted(registry.all_specs().items()):
        try:
            sdf = spec.fn(spark, d)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "spark_error", "detail": str(exc)[:200]}
            print(f"FAIL {name}: spark error: {str(exc)[:160]}")
            continue
        if spec.oracle is None:
            results[name] = {"status": "rows_only", "rows": len(srows)}
            print(f"ok   {name}: rows-only, {len(srows)} rows")
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [x[0] for x in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            results[name] = {"status": "duckdb_error", "detail": str(exc)[:200]}
            print(f"FAIL {name}: duckdb error: {str(exc)[:160]}")
            continue
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        # accepted at any --limit: a selective filter can drain the
        # input before the rollup, reproducing the empty-relation case
        if accept_empty_rollup_divergence(
            name, scols, ocols, len(srows), len(orows)
        ):
            results[name] = {"status": "known_rollup_divergence"}
            print(f"ok   {name}: known empty-rollup divergence (0 vs 1 row)")
            continue
        if (
            sorted(scols) != sorted(ocols)
            or len(srows) != len(orows)
            or row_multiset(srows, order) != row_multiset(orows, oorder)
        ):
            failures.append(name)
            results[name] = {
                "status": "mismatch",
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
            }
            print(f"FAIL {name}: spark={len(srows)} rows, duck={len(orows)}")
            continue
        results[name] = {"status": "match", "rows": len(srows)}
        print(f"ok   {name}: {len(srows)} rows match")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(
                {
                    "n_queries": len(results),
                    "n_failures": len(failures),
                    "results": results,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
