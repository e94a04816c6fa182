"""Streaming-maintained continuous aggregate == batch recompute, across
incremental file arrivals, late data, and batch replays."""

from __future__ import annotations

import pytest

from noaa_oracle_spark.incremental import DailyRollupStore
from noaa_oracle_spark.streaming.continuous_aggregate import (
    fold_batch,
    maintain_daily_rollup,
)

from tests.test_incremental_rollup import (
    _as_map,
    _assert_equal,
    _recompute,
    _snapshot,
)


def _drain(spark, data_dir, store, ckpt):
    q = maintain_daily_rollup(spark, data_dir, store, ckpt)
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_matches_recompute_and_folds_late_files(spark, tmp_path):
    data_dir = str(tmp_path / "wd")
    store = DailyRollupStore(str(tmp_path / "rollup"))
    ckpt = str(tmp_path / "ckpt")

    _snapshot(data_dir, 0)
    _snapshot(data_dir, 26)
    _drain(spark, data_dir, store, ckpt)
    _assert_equal(
        _as_map(store.serve(spark)), _as_map(_recompute(spark, data_dir))
    )
    days_before = {k[1] for k in _as_map(store.serve(spark))}

    # a late file lands for day 1 AFTER day 2 was folded; a fresh
    # availableNow run on the SAME checkpoint must fold only the new file
    _snapshot(data_dir, 3, temperature_value=-7.5)
    _drain(spark, data_dir, store, ckpt)
    inc = _as_map(store.serve(spark))
    assert {k[1] for k in inc} == days_before
    _assert_equal(inc, _as_map(_recompute(spark, data_dir)))
    assert any(
        v["temp_low"] == -7.5 for k, v in inc.items() if k[1] == "2026-01-15"
    )

    # no new files → drain is a no-op (state unchanged)
    before = _as_map(store.serve(spark))
    _drain(spark, data_dir, store, ckpt)
    _assert_equal(_as_map(store.serve(spark)), before)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-folded
    batch_id must not double-fold the partials."""
    data_dir = str(tmp_path / "wd")
    store = DailyRollupStore(str(tmp_path / "rollup"))
    _snapshot(data_dir, 0)
    _drain(spark, data_dir, store, str(tmp_path / "ckpt"))
    before = _as_map(store.serve(spark))

    from noaa_oracle_spark.sources.catalog import SnapshotCatalog
    from noaa_oracle_spark.sources.reader import read_snapshots

    cat = SnapshotCatalog(data_dir)
    batch = read_snapshots(spark, cat.all_paths("observations"),
                           "observations")
    # replay of batch 0 (already folded by the stream) → rejected
    assert fold_batch(spark, store, batch, 0) is False
    _assert_equal(_as_map(store.serve(spark)), before)
    # a genuinely new batch id with the same rows WOULD fold (proves the
    # guard is the batch marker, not an accident of empty input)
    assert fold_batch(spark, store, batch, 99) is True


def test_old_schema_files_stream_with_null_fill(spark, tmp_path):
    """Old-schema snapshot files (no precip_in/wx_string) must flow
    through the stream with NULL-filled late columns, same as the batch
    reader's canonical-schema semantics."""
    data_dir = str(tmp_path / "wd")
    store = DailyRollupStore(str(tmp_path / "rollup"))
    _snapshot(data_dir, 0, old_schema=True)
    _snapshot(data_dir, 6)
    _drain(spark, data_dir, store, str(tmp_path / "ckpt"))
    _assert_equal(
        _as_map(store.serve(spark)), _as_map(_recompute(spark, data_dir))
    )
