"""Incremental daily rollup == one-shot recompute, file by file, including
late-arriving snapshots that touch already-folded days."""

from __future__ import annotations

import math
import os
from datetime import datetime, timedelta, timezone

import pytest

from noaa_oracle_spark.incremental import DailyRollupStore
from noaa_oracle_spark.queries.weather import daily_observations
from noaa_oracle_spark.sources.catalog import SnapshotCatalog
from noaa_oracle_spark.sources.reader import read_snapshots

from tests.weather_fixtures import OBS_NEW_FIELDS, OBS_OLD_FIELDS, _obs_row, _write, rfc

UTC = timezone.utc
D0 = datetime(2026, 1, 15, tzinfo=UTC)
STATIONS = ["KATL", "KBOS", "KDEN"]


def _snapshot(data_dir: str, hour: int, old_schema: bool = False,
              **row_kw) -> str:
    rows = []
    for i, s in enumerate(STATIONS):
        kw = dict(
            generated_at=rfc(D0 + timedelta(hours=hour)),
            temperature_value=5.0 + i + hour * 0.1,
            dewpoint_value=1.0 + i,
            wind_speed=5 + hour,
        )
        if not old_schema:
            kw.update(precip_in=0.1 * (i + 1), precip_unit_code="inches",
                      wx_string=["RA", "SN", "FZRA"][i])
        kw.update(row_kw)
        rows.append(_obs_row(s, hour, **kw))
    day = (D0 + timedelta(hours=hour)).date().isoformat()
    p = os.path.join(
        data_dir, day,
        f"observations_{day}T{hour % 24:02d}_00_00+00_00.parquet",
    )
    _write(p, rows, OBS_OLD_FIELDS if old_schema else OBS_NEW_FIELDS)
    return p


def _recompute(spark, data_dir):
    cat = SnapshotCatalog(data_dir)
    obs = read_snapshots(spark, cat.all_paths("observations"), "observations")
    return daily_observations(obs)


def _as_map(df):
    out = {}
    for r in df.collect():
        d = r.asDict()
        out[(d.pop("station_id"), d.pop("date"))] = d
    return out


def _assert_equal(inc, full):
    assert inc.keys() == full.keys()
    for k in full:
        for col, want in full[k].items():
            got = inc[k][col]
            if isinstance(want, float) and want is not None and got is not None:
                assert got == pytest.approx(want, rel=1e-12), (k, col)
            else:
                assert got == want, (k, col)
    # at least one Magnus humidity actually materialized
    assert any(
        v["humidity"] is not None and not (
            isinstance(v["humidity"], float) and math.isnan(v["humidity"])
        )
        for v in full.values()
    )


def test_incremental_matches_recompute_per_file(spark, tmp_path):
    data_dir = str(tmp_path / "wd")
    store = DailyRollupStore(str(tmp_path / "rollup"))
    # snapshots across two days, first two files old-schema
    for i, hour in enumerate([0, 6, 12, 18, 24, 30]):
        _snapshot(data_dir, hour, old_schema=(i < 2))
        n = store.refresh(spark, data_dir)
        assert n == 1
        _assert_equal(
            _as_map(store.serve(spark)),
            _as_map(_recompute(spark, data_dir)),
        )
    # no new files → no-op
    assert store.refresh(spark, data_dir) == 0


def test_late_arrival_folds_into_existing_day(spark, tmp_path):
    data_dir = str(tmp_path / "wd")
    store = DailyRollupStore(str(tmp_path / "rollup"))
    _snapshot(data_dir, 0)
    _snapshot(data_dir, 26)
    store.refresh(spark, data_dir)
    days_before = {k[1] for k in _as_map(store.serve(spark))}
    # a late file lands for day 1 (hour 3) AFTER day 2 was folded
    _snapshot(data_dir, 3, temperature_value=-7.5)
    assert store.refresh(spark, data_dir) == 1
    inc = _as_map(store.serve(spark))
    assert {k[1] for k in inc} == days_before  # same days, updated values
    _assert_equal(inc, _as_map(_recompute(spark, data_dir)))
    # the late file's extreme temperature must have lowered the day-1 min
    assert any(
        v["temp_low"] == -7.5 for k, v in inc.items() if k[1] == "2026-01-15"
    )


def test_serve_filters(spark, tmp_path):
    data_dir = str(tmp_path / "wd")
    store = DailyRollupStore(str(tmp_path / "rollup"))
    for hour in [0, 24, 48]:
        _snapshot(data_dir, hour)
    store.refresh(spark, data_dir)
    got = store.serve(
        spark,
        station_ids=["KATL"],
        start_day="2026-01-16",
        end_day="2026-01-16",
    ).collect()
    assert len(got) == 1
    assert got[0]["station_id"] == "KATL" and got[0]["date"] == "2026-01-16"


def test_serve_before_refresh_raises(spark, tmp_path):
    store = DailyRollupStore(str(tmp_path / "rollup"))
    with pytest.raises(FileNotFoundError):
        store.serve(spark)
