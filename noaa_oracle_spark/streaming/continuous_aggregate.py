"""Streaming maintenance of the daily-rollup continuous aggregate.

`incremental.rollup.DailyRollupStore.refresh()` is the pull path: a caller
decides when to fold new snapshot files. This module is the push path — the
same mergeable-partials state maintained by Structured Streaming: the file
source discovers newly-landed snapshot files (checkpointed, so each file
enters exactly one microbatch), and a `foreachBatch` sink folds each batch's
partials into the parquet state with the store's atomic tmp+rename swap.

Exactly-once: Spark guarantees each file is *offered* once per checkpoint,
but a crashed batch can be REPLAYED — foreachBatch is at-least-once. The
fold is made idempotent the standard way: the last folded `batch_id` rides
INSIDE the state directory and commits in the same atomic swap as the
state itself (incremental/statedir.py), so every crash point resolves to
(state, marker) pairs that agree — a replayed batch is either entirely
absent (refolded, correct) or entirely present (rejected by the marker,
correct), never half-applied or double-applied. foreachBatch executions
are serialized per query, preserving the reference's single-writer
mutation model (sqlite.rs:24-72).

A store must be maintained by EITHER the batch `refresh()` path OR one
streaming query — not both: refresh() tracks processed files in its own
manifest, the stream tracks them in its checkpoint, and the two would
double-fold each other's inputs.

At 100 TB scale this is the hourly-cadence sweet spot: each microbatch
reads only the new snapshot files (one file per cadence tick), computes
per-(station, day) partials — a few thousand rows — and rewrites the small
state table. The raw history is never re-scanned, which is the whole point
of a continuous aggregate (SCALE.md §3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from noaa_oracle_spark.incremental import statedir
from noaa_oracle_spark.incremental.rollup import (
    DailyRollupStore,
    _merge,
    _partials,
)
from noaa_oracle_spark.streaming.snapshots import stream_snapshots

_MARKER = "_stream_batch.json"


def _last_folded_batch(store: DailyRollupStore) -> int:
    meta = statedir.read_meta(store._state_path, _MARKER)
    return meta["batch_id"] if meta else -1


def fold_batch(
    spark: SparkSession, store: DailyRollupStore, batch_df: DataFrame,
    batch_id: int,
) -> bool:
    """Fold one microbatch of observation rows into the store's partial
    state. Returns False (no-op) for an already-folded batch replay or an
    empty batch. The batch marker commits in the same atomic swap as the
    state (statedir.publish), so a replay after any crash sees a
    (state, marker) pair that agrees about this batch."""
    if batch_id <= _last_folded_batch(store):
        return False
    delta = _partials(batch_df)
    if not delta.take(1):
        return False
    state_path = store._state_path
    if os.path.exists(state_path):
        merged = _merge(spark.read.parquet(state_path), delta)
    else:
        merged = delta
    tmp = state_path + ".tmpdir"
    merged.write.mode("overwrite").parquet(tmp)
    statedir.publish(state_path, tmp, {"batch_id": batch_id}, _MARKER)
    return True


def maintain_daily_rollup(
    spark: SparkSession,
    data_dir: str,
    store: DailyRollupStore,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the maintenance query. `available_now=True` drains every
    currently-visible snapshot file then stops (the batch-job-shaped
    trigger — what an hourly cron would run); False runs continuously,
    folding files as they land."""
    stream = stream_snapshots(spark, data_dir, "observations")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(spark, store, batch_df, batch_id)

    writer = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
