#!/usr/bin/env python3
"""q68 (TPC-H Q11 shape) plan-shape measurement: the pinned two-scan
crossJoin-broadcast-total vs the persist(per_part) alternative the r4/r5
verdicts asked to quantify (suite.py q68_important_parts rationale;
test_plan_quality pins two scans).

Shapes compared on a synthetic lineitem (uniform keys, 2-dp prices — the
q68 data shape at adjustable row count):

  two_scan   per_part computed twice (Spark duplicates the subtree feeding
             the total aggregate and the filter side; both scans are
             pruned to the 4 needed columns and run in parallel)
  persist    per_part.persist() — one pruned scan + one groupBy, the
             second consumer reads the cached 2M-row aggregate; the cost
             is materializing the cache and a barrier between building it
             and using it
  Both produce identical results (asserted).

    Q68_BENCH_ROWS=20000000 Q68_BENCH_PARTS=2000000 python bench_q68.py

Prints one JSON line; evidence harness for SCALE.md, not a driver contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ROWS = int(os.environ.get("Q68_BENCH_ROWS", "20000000"))
N_PARTS = int(os.environ.get("Q68_BENCH_PARTS", "2000000"))
# TPC-H Q11's 0.0001 fraction assumes ~200 parts carry outsized value; on
# the uniform synthetic keys every part holds ~avg value, so the bench
# threshold defaults to 1.5× the mean share — a real (non-empty, non-all)
# result set whose filter actually evaluates.
THRESH = float(os.environ.get("Q68_BENCH_THRESH", str(1.5 / N_PARTS)))
N_SUPP = 10000
FIXTURE = f"/tmp/noaa_q68_bench_{N_ROWS}_{N_PARTS}"


def _generate() -> None:
    if os.path.exists(os.path.join(FIXTURE, "lineitem.parquet")):
        return
    os.makedirs(FIXTURE, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(42)
    pq.write_table(
        pa.table(
            {
                "l_partkey": rng.randint(1, N_PARTS + 1, N_ROWS),
                "l_suppkey": rng.randint(1, N_SUPP + 1, N_ROWS),
                "l_extendedprice": np.round(
                    rng.uniform(900, 105000, N_ROWS), 2
                ),
                "l_discount": np.round(rng.uniform(0, 0.1, N_ROWS), 2),
            }
        ),
        os.path.join(FIXTURE, "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": np.arange(1, N_SUPP + 1),
                "s_nationkey": rng.randint(0, 25, N_SUPP),
            }
        ),
        os.path.join(FIXTURE, "supplier.parquet"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from noaa_oracle_spark.session import get_spark

    _generate()
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="noaa-q68-bench")
    spark.sparkContext.setLogLevel("ERROR")
    lineitem = spark.read.parquet(os.path.join(FIXTURE, "lineitem.parquet"))
    supplier = spark.read.parquet(os.path.join(FIXTURE, "supplier.parquet"))

    def per_part_of():
        s1 = supplier.filter(F.col("s_nationkey") == 7)
        return (
            lineitem.join(
                F.broadcast(s1), F.col("l_suppkey") == F.col("s_suppkey")
            )
            .groupBy("l_partkey")
            .agg(
                F.round(
                    F.sum(
                        F.col("l_extendedprice")
                        * (F.lit(1.0) - F.col("l_discount"))
                    ),
                    4,
                ).alias("part_value")
            )
        )

    def two_scan():
        per_part = per_part_of()
        total = per_part.agg(
            F.round(F.sum("part_value"), 4).alias("total_value")
        )
        return (
            per_part.crossJoin(F.broadcast(total))
            .filter(F.col("part_value") > F.col("total_value") * THRESH)
            .count()
        )

    def persisted():
        per_part = per_part_of().persist()
        try:
            total = per_part.agg(
                F.round(F.sum("part_value"), 4).alias("total_value")
            )
            return (
                per_part.crossJoin(F.broadcast(total))
                .filter(F.col("part_value") > F.col("total_value") * THRESH)
                .count()
            )
        finally:
            per_part.unpersist()

    out: dict[str, dict] = {}
    results = {}
    for name, fn in [("two_scan", two_scan), ("persist", persisted)]:
        spark.catalog.clearCache()
        best = None
        for _ in range(int(os.environ.get("Q68_BENCH_REPS", "3"))):
            t0 = time.perf_counter()
            n = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            results[name] = n
        out[name] = {"sec": round(best, 2), "rows": results[name]}
    assert results["two_scan"] == results["persist"], results
    print(
        json.dumps(
            {
                "metric": "q68_plan_shapes",
                "n_rows": N_ROWS,
                "n_parts": N_PARTS,
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
