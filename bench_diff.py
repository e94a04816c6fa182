#!/usr/bin/env python3
"""Per-query regression diff between two driver bench records.

    python bench_diff.py BENCH_r01.json BENCH_r02.json [--threshold 1.25]

Prints one line per query whose time ratio (new/old) exceeds the
threshold (regressions) or drops below its inverse (improvements), plus a
summary with the total ratio. Exit code 1 if any regression exceeds the
threshold — usable as a round-protocol gate. Queries present in only one
record are listed as added/removed, never as regressions.
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load(path: str) -> dict:
    """Accept either bench.py's raw JSON line or the driver's BENCH_r{N}
    wrapper ({"n", "rc", "cpus", "sf", "tail": "<head-truncated stdout>"}).
    The wrapper's tail may be cut mid-stream, so per-query timings are
    recovered by regex; queries whose entry fell off the truncated head
    are simply absent (reported as added/removed, never as regressions)."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    tail = d.get("tail", "")
    queries = {
        name: float(sec)
        for name, sec in re.findall(r'"(q\w+)":\s*([0-9.]+)', tail)
    }
    m = re.search(r'"value":\s*([0-9.]+)', tail)
    return {"queries": queries, "value": float(m.group(1)) if m else 0.0}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.25)
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.2,
        help="ignore queries faster than this in BOTH records "
        "(sub-200ms timings are scheduler noise)",
    )
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    regressions, improvements = [], []
    for name in sorted(set(oq) & set(nq)):
        o, n = float(oq[name]), float(nq[name])
        if max(o, n) < args.min_sec or o <= 0:
            continue
        ratio = n / o
        if ratio > args.threshold:
            regressions.append((name, o, n, ratio))
        elif ratio < 1 / args.threshold:
            improvements.append((name, o, n, ratio))

    for name, o, n, r in regressions:
        print(f"REGRESSION  {name}: {o:.3f}s -> {n:.3f}s  ({r:.2f}x)")
    for name, o, n, r in improvements:
        print(f"improvement {name}: {o:.3f}s -> {n:.3f}s  ({r:.2f}x)")
    for name in added:
        print(f"added       {name}: {float(nq[name]):.3f}s")
    for name in removed:
        print(f"removed     {name}")

    to, tn = float(old.get("value", 0)), float(new.get("value", 0))
    if to and tn:
        print(
            f"total: {to:.1f}s -> {tn:.1f}s ({tn / to:.2f}x), "
            f"{len(regressions)} regression(s), "
            f"{len(improvements)} improvement(s), "
            f"{len(added)} added, {len(removed)} removed"
        )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
