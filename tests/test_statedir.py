"""Crash-safety of the incremental stores' state publication.

The dangerous failure is the torn commit: a state directory that already
contains folded files whose manifest does not record them — the re-run
then folds the same files twice and every SUM partial silently doubles.
statedir co-commits manifest and state in one rename; these tests simulate
the surviving crash windows and assert sums stay exact."""

from __future__ import annotations

import os
import shutil

from noaa_oracle_spark.incremental import DailyRollupStore, statedir

from tests.test_incremental_rollup import _as_map, _recompute, _snapshot


def test_manifest_commits_with_state(spark, tmp_path):
    """After any refresh, the manifest inside the state dir must already
    record every file whose rows the state contains — no ordering window."""
    data_dir = str(tmp_path / "wd")
    store = DailyRollupStore(str(tmp_path / "rollup"))
    _snapshot(data_dir, 0)
    store.refresh(spark, data_dir)
    assert os.path.exists(
        statedir.meta_path(store._state_path)
    ), "manifest must live inside the state directory"
    # a second refresh with no new files must be a no-op — even if the
    # process had died right after the swap, the manifest was already in
    assert store.refresh(spark, data_dir) == 0


def test_crash_between_renames_recovers(spark, tmp_path):
    """Death between parking the old state and publishing the new one
    leaves only `<state>.old`; recover() must restore it and the next
    refresh must fold exactly the genuinely-new files once."""
    data_dir = str(tmp_path / "wd")
    store = DailyRollupStore(str(tmp_path / "rollup"))
    _snapshot(data_dir, 0)
    store.refresh(spark, data_dir)
    want_one_file = _as_map(store.serve(spark))

    # simulate: refresh #2 parked the old state then died (its tmp lost)
    os.rename(store._state_path, store._state_path + ".old")
    _snapshot(data_dir, 6)

    assert store.refresh(spark, data_dir) == 1  # only the new file
    got = _as_map(store.serve(spark))
    want = _as_map(_recompute(spark, data_dir))
    assert got.keys() == want.keys()
    for k in want:
        assert got[k]["rain_amt"] == want[k]["rain_amt"], k
        assert got[k]["temp_low"] == want[k]["temp_low"], k
    assert want_one_file  # first state was readable too


def test_stale_tmpdir_is_harmless(spark, tmp_path):
    data_dir = str(tmp_path / "wd")
    store = DailyRollupStore(str(tmp_path / "rollup"))
    _snapshot(data_dir, 0)
    # leftover tmp from a crashed writer
    junk = store._state_path + ".tmpdir"
    os.makedirs(junk)
    with open(os.path.join(junk, "garbage"), "w") as f:
        f.write("x")
    store.refresh(spark, data_dir)
    got = _as_map(store.serve(spark))
    want = _as_map(_recompute(spark, data_dir))
    assert got.keys() == want.keys()
    assert not os.path.exists(store._state_path + ".old")


def test_live_state_beats_parked_copy(spark, tmp_path):
    """Crash after publication but before cleanup leaves both state and
    .old; the live state must win and .old must be dropped."""
    data_dir = str(tmp_path / "wd")
    store = DailyRollupStore(str(tmp_path / "rollup"))
    _snapshot(data_dir, 0)
    store.refresh(spark, data_dir)
    shutil.copytree(store._state_path, store._state_path + ".old")
    _snapshot(data_dir, 6)
    assert store.refresh(spark, data_dir) == 1
    assert not os.path.exists(store._state_path + ".old")
    got = _as_map(store.serve(spark))
    want = _as_map(_recompute(spark, data_dir))
    for k in want:
        assert got[k]["rain_amt"] == want[k]["rain_amt"], k
