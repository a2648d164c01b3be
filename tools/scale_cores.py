"""Core-count scaling smoke for the iterative/heavy family (VERDICT r17
item 2): at sf0.1 every heavy query is job-overhead-bound and c8 ≈ c32,
so the claim that the per-round shape parallelises was argued, not
demonstrated. This runs the heavy queries on the AMPLIFIED smoke corpora
(scale_smoke.py's builders: lineitem/orders ×10 for the graph family,
documents ×4 for the dedup family) at 8 vs 32 cores and prints the
markdown rows for SCALE_SMOKE.md.

    python tools/scale_cores.py            # builds data, runs both core counts
    python tools/scale_cores.py --cpus N --data DIR --queries a,b,c   # child

The parent builds the amplified dirs once, then launches one fresh-JVM
child per core count (master is fixed per JVM, so each count needs its
own process; fresh JVMs also keep the two runs like-for-like cold).
Per-query protocol inside a child: one warm-up + median of 2 timed runs
(the bench.py convention).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GRAPH_QUERIES = ["q_graph_cc", "q_graph_lpa"]
DOCS_QUERIES = ["q_dedup_clusters_lsh", "q_dedup_keep_best", "q_pipeline_curate"]
FACT_DIR = "/tmp/sks-scale-cores/fact10"
DOCS_DIR = "/tmp/sks-scale-cores/docs4"


def build(spark) -> None:
    import shutil

    from spring_and_kafka_spark.sources.tables import TABLES
    from tools.scale_smoke import BASE, build_scaled_docs, build_scaled_fact

    for out, amplified in (
        (Path(FACT_DIR), ("lineitem", "orders")),
        (Path(DOCS_DIR), ("documents",)),
    ):
        shutil.rmtree(out, ignore_errors=True)
        out.mkdir(parents=True)
        for t in TABLES:
            if t not in amplified:
                os.symlink(f"{BASE}/{t}.parquet", out / f"{t}.parquet")
    build_scaled_fact(spark, 10, Path(FACT_DIR))
    build_scaled_docs(spark, 4, Path(DOCS_DIR))


def child(cpus: int, data: str, queries: list[str]) -> None:
    from spring_and_kafka_spark import registry
    from spring_and_kafka_spark.session import get_spark

    spark = get_spark(f"scale_cores_{cpus}", cpus=cpus, shuffle_partitions=cpus)
    specs = registry.all_specs()
    out = {}
    for q in queries:
        fn = specs[q].fn
        fn(spark, data).count()  # warm-up
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, data).count()
            reps.append(time.perf_counter() - t0)
        out[q] = round(statistics.median(reps), 3)
        print(f"# c{cpus} {q}: {out[q]:.3f}s", file=sys.stderr)
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--data")
    ap.add_argument("--queries")
    args = ap.parse_args()
    if args.cpus:
        child(args.cpus, args.data, args.queries.split(","))
        return

    from spring_and_kafka_spark.session import get_spark

    build(get_spark("scale_cores_build", cpus=32))
    # The sandbox's documented multi-× host-drift windows make a single
    # child run per core count worthless (one drifted JVM inverts the
    # ratio) — ALTERNATE fresh-JVM children per core count and take the
    # per-query MIN per side, the r17 drift-adjudication convention.
    rounds = 3
    results: dict[str, dict[int, dict]] = {}
    for data, queries in ((FACT_DIR, GRAPH_QUERIES), (DOCS_DIR, DOCS_QUERIES)):
        for r in range(rounds):
            for cpus in (32, 8):
                p = subprocess.run(
                    [
                        sys.executable,
                        __file__,
                        "--cpus",
                        str(cpus),
                        "--data",
                        data,
                        "--queries",
                        ",".join(queries),
                    ],
                    capture_output=True,
                    text=True,
                    check=True,
                )
                sys.stderr.write(p.stderr)
                got = json.loads(p.stdout.strip().splitlines()[-1])
                acc = results.setdefault(data, {}).setdefault(cpus, {})
                for q, t in got.items():
                    acc[q] = min(acc.get(q, t), t)
    print(f"| query | corpus | c8 sec | c32 sec | c8/c32 | (min over {rounds} alternating fresh-JVM rounds/side) |")
    print("|---|---|---|---|---|---|")
    for data, queries in ((FACT_DIR, GRAPH_QUERIES), (DOCS_DIR, DOCS_QUERIES)):
        tag = "facts ×10" if data == FACT_DIR else "docs ×4"
        for q in queries:
            t8 = results[data][8][q]
            t32 = results[data][32][q]
            print(f"| `{q}` | {tag} | {t8:.2f} | {t32:.2f} | {t8 / t32:.2f}× | |")


if __name__ == "__main__":
    main()
