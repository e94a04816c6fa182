"""Snapshot parquet sinks (S6/S7).

The daemon writes one parquet file per hourly snapshot under the date dir
(crates/daemon/src/main.rs:96-115; observation writer
download_observations.rs:305-371, forecast writer streams a row group per
50-station batch, download_forecast.rs:1073-1183).

Spark-first: `df.write.parquet` produces one file per partition — Spark's
parallel analog of the reference's row-group-per-batch appends. For
filename-parity with the reference's `{kind}_{ts}.parquet` catalog we
coalesce(1) and move the single part file into place; at 100 TB the
`single_file=False` path keeps one *directory* per snapshot with many part
files, which the catalog treats as one logical snapshot — parallel write,
same pruning.
"""

from __future__ import annotations

import glob
import os
import shutil
from datetime import datetime

from pyspark.sql import DataFrame

from noaa_oracle_spark.sources.catalog import snapshot_path


def write_snapshot(
    df: DataFrame,
    data_dir: str,
    kind: str,
    ts: datetime,
    single_file: bool = True,
) -> str:
    """Write a snapshot; returns the catalog path."""
    target = snapshot_path(data_dir, kind, ts)
    os.makedirs(os.path.dirname(target), exist_ok=True)
    if not single_file:
        df.write.mode("overwrite").parquet(target)
        return target
    tmp = target + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))
    if len(part) != 1:
        raise RuntimeError(f"expected one part file, got {part}")
    shutil.move(part[0], target)
    shutil.rmtree(tmp)
    return target
