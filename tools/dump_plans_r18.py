"""Dump .explain('formatted') for named queries into plans/r18/.

    python tools/dump_plans_r18.py before q_graph_cc q_graph_bfs ...
    python tools/dump_plans_r18.py after  q_graph_cc ...

Writes plans/r18/<query>_<tag>.txt. Iterative queries' plan dumps show
the FINAL returned frame's plan (the tail over materialized inputs);
for those the per-phase shape is argued in OPTIMIZATION_r18.md against
the code. Uses sf0.01 inputs (plan shape is scale-independent).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spring_and_kafka_spark import registry  # noqa: E402
from spring_and_kafka_spark.plans import formatted_plan  # noqa: E402
from spring_and_kafka_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
OUT = Path(__file__).resolve().parent.parent / "plans" / "r18"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump_plans_r18")
    specs = registry.all_specs()
    for name in names:
        df = specs[name].fn(spark, SF)
        (OUT / f"{name}_{tag}.txt").write_text(formatted_plan(df))
        print(f"wrote {name}_{tag}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
