"""Snapshot compaction + layout optimization (the 100 TB small-file story).

The reference writes one file per kind per hour (daemon/src/main.rs:96-115)
— ~8,760 files/kind/year. At cluster scale that layout dies twice: object
listings and Spark task scheduling become metadata-bound (a task per tiny
file), and row groups are too small for effective min/max skipping. Standard
lakehouse answer: periodically rewrite closed date partitions into a few
size-targeted, sorted files (Delta OPTIMIZE / Iceberg rewrite_data_files).

Correctness contract — why rewrites are invisible to every query:

  * The compacted output is named `{kind}_{min}__{max}.compacted.parquet`
    where [min, max] is the snapshot-ts interval of the source files. The
    catalog includes it on interval OVERLAP with the query window
    (catalog.parse_snapshot_name), which by construction matches whenever
    ANY source file would have matched — file selection can only widen,
    never narrow.
  * Every weather query applies row-level generated_at predicates (P2/P3,
    weather_data.rs:115-166) and the forecast path dedups latest-wins on
    generated_at (D1, :213-235), so extra rows introduced by widening are
    filtered or lose the argmax exactly as they would have uncompacted.
  * Row VALUES are rewritten unchanged (no casts); the output schema is the
    mergeSchema union of the sources, so rows from pre-evolution files store
    explicit NULLs in late-added columns — exactly the value union_by_name
    read semantics already assigned them (weather_data.rs:198-211).

Layout: `repartitionByRange(station_id)` then
`sortWithinPartitions(station_id, generated_at)` clusters each output file
and row group by station. Parquet min/max column stats then let the scan
skip whole row groups for station IN-list queries (P1) — the poor man's
Z-order, and the right single-dimension order because every reference query
filters or groups by station first.
"""

from __future__ import annotations

import glob
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from noaa_oracle_spark.sources.catalog import (
    SnapshotFile,
    format_ts_for_filename,
    parse_snapshot_name,
)


@dataclass(frozen=True)
class CompactionPlan:
    day_dir: str
    kind: str
    sources: list[SnapshotFile]
    total_bytes: int
    n_output_files: int

    @property
    def target_path(self) -> str:
        lo = min(f.lo for f in self.sources)
        hi = max(f.snapshot_ts for f in self.sources)
        name = (
            f"{self.kind}_{format_ts_for_filename(lo)}"
            f"__{format_ts_for_filename(hi)}.compacted.parquet"
        )
        return os.path.join(self.day_dir, name)


def _path_bytes(path: str) -> int:
    if os.path.isdir(path):
        return sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(path, "**"), recursive=True)
            if os.path.isfile(p)
        )
    return os.path.getsize(path)


def plan_compaction(
    data_dir: str,
    day: str,
    kind: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_input_files: int = 2,
) -> CompactionPlan | None:
    """Plan a rewrite of one closed date dir; None if nothing to do.

    Only compact *closed* days (day < today at the caller's discretion):
    an hourly writer appending into the same dir mid-compaction would have
    its file deleted by a naive rewrite. The plan-then-apply split keeps
    that policy (and any locking) at the orchestration layer, like the
    reference's single-writer queue keeps SQLite mutations serial
    (sqlite.rs:24-72)."""
    day_dir = os.path.join(data_dir, day)
    if not os.path.isdir(day_dir):
        return None
    sources: list[SnapshotFile] = []
    for name in sorted(os.listdir(day_dir)):
        sf = parse_snapshot_name(name, kind)
        if sf is not None:
            sources.append(
                SnapshotFile(
                    os.path.join(day_dir, name), kind, sf.snapshot_ts,
                    sf.snapshot_lo,
                )
            )
    if len(sources) < min_input_files:
        return None
    total = sum(_path_bytes(f.path) for f in sources)
    n_out = max(1, -(-total // target_file_bytes))
    return CompactionPlan(day_dir, kind, sources, total, n_out)


def apply_compaction(
    spark: SparkSession,
    plan: CompactionPlan,
    sort_cols: tuple[str, ...] = ("station_id", "generated_at"),
) -> str:
    """Execute a plan: read sources, range-partition + sort, write the
    compacted snapshot atomically (tmp dir → rename), delete sources.

    mergeSchema=true (not the canonical schema): source files from before a
    schema addition genuinely lack columns; merging unions the schemas so no
    data is invented — readers still normalize to canonical at query time.
    Ordering note: rename-into-place happens before source deletion, so a
    crash can leave BOTH the compacted file and sources visible. That window
    is benign for forecasts (D1 latest-wins dedup) but would double-count
    observation sums, so orchestration should re-run (deletion is
    idempotent) before serving the partition — same recover-by-redo model
    as the reference's append-only snapshot dirs."""
    target = plan.target_path
    tmp = target + ".tmpdir"
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(*[f.path for f in plan.sources])
    )
    cols = [c for c in sort_cols if c in df.columns]
    if cols:
        df = df.repartitionByRange(plan.n_output_files, *[F.col(c) for c in cols])
        df = df.sortWithinPartitions(*cols)
    else:
        df = df.repartition(plan.n_output_files)
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target):
        shutil.rmtree(target)
    os.rename(tmp, target)
    for f in plan.sources:
        if os.path.isdir(f.path):
            shutil.rmtree(f.path)
        else:
            os.remove(f.path)
    return target


def compact_table_dir(
    spark: SparkSession,
    table_dir: str,
    sort_cols: tuple[str, ...] = (),
    target_file_bytes: int = 128 * 1024 * 1024,
    min_input_files: int = 2,
) -> int | None:
    """Compact a PIPELINE table directory (documents/embeddings — any
    parquet dir a crawl or dedup stage shredded into many small parts)
    into few size-targeted, optionally sorted files. Returns the new file
    count, or None if the dir is already compact.

    The corpus counterpart of the snapshot compactor above, with a simpler
    invisibility argument: a table directory has no embedded-timestamp
    pruning contract — every reader scans the whole dir — so a rewrite
    that preserves row VALUES (no casts; same columns) is invisible to
    every operator by construction; only task counts and row-group stats
    change. Sorting by the table's id (doc_id/vec_id) clusters row groups
    for min/max skipping on id-range scans and makes downstream
    per-partition work deterministic.

    Atomicity: write to `.tmpdir`, swap via rename of the CONTENTS into
    the original dir after clearing it — the brief window where the dir is
    empty is the same recover-by-redo model as apply_compaction; run it
    from the orchestration layer, not under live readers."""
    if not os.path.isdir(table_dir):
        return None
    parts = [
        p
        for p in sorted(glob.glob(os.path.join(table_dir, "*.parquet")))
        if os.path.isfile(p)
    ]
    if len(parts) < min_input_files:
        return None
    total = sum(os.path.getsize(p) for p in parts)
    n_out = max(1, -(-total // target_file_bytes))
    if n_out >= len(parts):
        return None
    df = spark.read.parquet(table_dir)
    cols = [c for c in sort_cols if c in df.columns]
    if cols:
        out = df.repartitionByRange(n_out, *[F.col(c) for c in cols])
        out = out.sortWithinPartitions(*cols)
    else:
        out = df.repartition(n_out)
    tmp = table_dir.rstrip("/") + ".tmpdir"
    out.write.mode("overwrite").parquet(tmp)
    for p in parts:
        os.remove(p)
    moved = 0
    for p in sorted(glob.glob(os.path.join(tmp, "*"))):
        base = os.path.basename(p)
        if base.startswith("part-") or base == "_SUCCESS":
            shutil.move(p, os.path.join(table_dir, base))
            if base.startswith("part-"):
                moved += 1
    shutil.rmtree(tmp, ignore_errors=True)
    return moved


def compact_date_dir(
    spark: SparkSession,
    data_dir: str,
    day: str,
    kind: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> str | None:
    """plan + apply in one call; returns the compacted path or None."""
    plan = plan_compaction(data_dir, day, kind, target_file_bytes)
    if plan is None:
        return None
    return apply_compaction(spark, plan)
