"""Derive the driver-verification rotation pool from the CORRECTNESS files.

The 50-slot window (``registry._WINDOW_PREFIX``) is rotated each round so
every query eventually owns a fresh green row. The rotation input is the
*last-verified round* per query — and hand-counting it in a comment has
been wrong three rounds out of four (VERDICT r7/r8/r9 "What's wrong").
This tool computes it from the artifacts, which are the ground truth:

    python -m tools.window_pool            # histogram + stalest-first pool
    python -m tools.window_pool --json     # machine-readable map

A row counts as verified in round N iff CORRECTNESS_r0N.json has it with
rows_match && schema_match && hash_match (or rows-only for no-oracle
specs: rows_match with hash_match absent/None) and err == null. Queries
never seen in any round report round 0.

tests/test_registry_window.py pins this module's output against the
committed artifacts so the registry comment can cite it verbatim.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _row_green(row: dict) -> bool:
    if row.get("err") is not None:
        return False
    if not row.get("rows_match"):
        return False
    # hash/schema checks apply when present (rows-only checks omit them
    # or record null); a present-and-false value is a red row.
    for k in ("schema_match", "hash_match"):
        if k in row and row[k] is not None and not row[k]:
            return False
    return True


def last_verified(repo: str = REPO, through_round: int | None = None) -> dict[str, int]:
    """Map query name -> last round it was driver-green (0 = never).

    ``through_round`` bounds the input artifacts: pass the round whose
    window derivation you are pinning (e.g. the r11 window is derived
    from CORRECTNESS_r01..r10, so ``through_round=10``). Without it the
    driver depositing next round's artifact retroactively breaks any
    snapshot assert (VERDICT r10 item 1 — the two red pins) — tests must
    EITHER bound the input or assert only invariants.
    """
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if through_round is not None and rnd > through_round:
            continue
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if _row_green(row):
                out[name] = max(out.get(name, 0), rnd)
            else:
                out.setdefault(name, 0)
    return out


def histogram(lv: dict[str, int]) -> dict[int, int]:
    return dict(sorted(Counter(lv.values()).items()))


def pool(lv: dict[str, int], all_names: list[str] | None = None) -> list[str]:
    """Rotation pool, stalest first; ties broken by name for stability.

    If ``all_names`` is given (the full registry), names with no
    CORRECTNESS row ever are included at round 0 — they must lead any
    window they can reach.
    """
    merged = dict(lv)
    for n in all_names or []:
        merged.setdefault(n, 0)
    return [n for n, _ in sorted(merged.items(), key=lambda kv: (kv[1], kv[0]))]


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--pool", type=int, default=60, help="pool entries to print")
    args = ap.parse_args()

    lv = last_verified()
    if args.json:
        print(json.dumps({"last_verified": lv, "histogram": {str(k): v for k, v in histogram(lv).items()}}))
        return
    hist = histogram(lv)
    print("last-verified histogram (round -> queries):")
    for rnd, n in hist.items():
        print(f"  r{rnd}: {n}")
    print(f"total tracked: {len(lv)}")
    stale = pool(lv)
    print(f"\nrotation pool, stalest first (top {args.pool}):")
    for name in stale[: args.pool]:
        print(f"  r{lv[name]}  {name}")


if __name__ == "__main__":
    main()
