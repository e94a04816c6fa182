#!/usr/bin/env python3
"""Benchmark harness: runs the full query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized via the noop sink — full plan execution including
the final projection, no driver-collect or disk-write overhead polluting the
timing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from noaa_oracle_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Local-bench tuning: 8 initial shuffle partitions (per-task scheduling
    # overhead dominates at sf0.1; at real scale AQE coalesce/skew-split
    # governs effective parallelism, so this is an initial hint, not a cap).
    spark = get_spark(
        app_name="noaa-oracle-spark-bench",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm-up pass: JIT, parquet footers, broadcast exchange reuse. The
    # engine is a long-running service — warm-state throughput is the
    # representative measurement; mode is recorded in the output.
    for name in sorted(qs):
        run(name)

    # Min-of-N protocol (round-6 verdict): a single warm pass carries
    # ±7–20% machine-state noise per query (two identical-protocol r6
    # runs differed 7% on unchanged code), so round-over-round diffs
    # flagged weather, not code.  Taking the per-query MIN over >=2
    # timed passes keeps the series comparable across rounds.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    for _ in range(reps):
        for name in sorted(qs):
            t = run(name)
            if name not in timings or t < timings[name]:
                timings[name] = t
    timings = {name: round(t, 3) for name, t in timings.items()}
    total = sum(timings.values())

    print(
        json.dumps(
            {
                "metric": "suite_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "mode": f"warm-min{reps}",
                "n_queries": len(timings),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
