"""NaN/±Inf-injection sweep: prove the finite-or-null ingest contract.

Round 9's NANCHECK diagnostic ran the registry against raw-NaN fixtures
with NO contract in the scan path and recorded 39/226 failures with
unguardable cross-engine failure modes (NANCHECK.json). Round 10 wired
the contract into the scan itself (sources/tables.py:
_enforce_float_contract): external NaN/±Inf doubles normalize to NULL,
and a vector with any non-finite component normalizes to a NULL vector.

This sweep is the proof (VERDICT r9 item 3): inject non-finite values
into every known double/vector column of the sf0.001 fixture, then run
the FULL registry through selfcheck with --contract-views, so the
DuckDB oracle reads through the same ingest boundary the engine's scan
enforces. Green = the NANCHECK failure mode cannot reach any operator
via the engine's own scan path.

Injection policy (deterministic, seed-free; disjoint from the NULL
sweep's (i+3j)%7 pattern so the two batteries compose):
- scalar double column j of a table: rows where (i + 5*j) % 11 == 0 get
  NaN, rows where (i + 5*j) % 11 == 1 get +Inf, == 2 get -Inf
  (~27% of rows carry some non-finite value — deliberately brutal);
- embedding vectors: rows where i % 13 == 0 get NaN planted in element
  i % 64, rows where i % 13 == 1 get +Inf in element (i+7) % 64.

    python tools/nan_sweep.py [--json NANSWEEP.json] [query ...]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spring_and_kafka_spark.sources.tables import (  # noqa: E402
    DOUBLE_COLS,
    TABLES,
    VECTOR_COLS,
)

SRC = "/root/testdata/sf0.001"

NAN = float("nan")
INF = float("inf")


def build_nan_dir(dst: str) -> None:
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        n = tbl.num_rows
        cols = []
        for j, name in enumerate(tbl.column_names):
            col = tbl.column(name).combine_chunks()
            if name in DOUBLE_COLS.get(t, ()):
                vals = col.to_pylist()
                for i in range(n):
                    m = (i + 5 * j) % 11
                    if m == 0:
                        vals[i] = NAN
                    elif m == 1:
                        vals[i] = INF
                    elif m == 2:
                        vals[i] = -INF
                col = pa.array(vals, type=col.type)
            elif name in VECTOR_COLS.get(t, ()):
                vals = col.to_pylist()
                for i in range(n):
                    # empty (but non-NULL) lists would make the index
                    # below divide by zero — skip them like NULLs
                    if vals[i] is None or not vals[i]:
                        continue
                    if i % 13 == 0:
                        v = list(vals[i])
                        v[i % len(v)] = NAN
                        vals[i] = v
                    elif i % 13 == 1:
                        v = list(vals[i])
                        v[(i + 7) % len(v)] = INF
                        vals[i] = v
                col = pa.array(vals, type=col.type)
            cols.append(col)
        out = pa.table(cols, schema=tbl.schema)
        pq.write_table(out, f"{dst}/{t}.parquet")


def main() -> int:
    args = sys.argv[1:]
    flags: list[str] = []
    queries: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--json":
            flags += args[i : i + 2]
            i += 2
        elif args[i] == "--vanilla":
            flags.append(args[i])
            i += 1
        else:
            queries.append(args[i])
            i += 1
    dst = tempfile.mkdtemp(prefix="nansweep-")
    build_nan_dir(dst)
    print(f"non-finite fixture at {dst}")
    from tools import selfcheck

    sys.argv = ["selfcheck.py", "--contract-views", *flags, dst, *queries]
    return selfcheck.main()


if __name__ == "__main__":
    raise SystemExit(main())
