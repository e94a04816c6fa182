"""Latest-forecast continuous aggregate: folding snapshot files one at a
time == the one-shot recompute, including stale re-forecasts, cross-offset
duplicate windows, and old-schema files."""

from __future__ import annotations

import math
import os
from datetime import datetime, timedelta, timezone

import pytest

from noaa_oracle_spark.incremental import LatestForecastStore
from noaa_oracle_spark.queries.weather import forecasts_data
from noaa_oracle_spark.sources.catalog import SnapshotCatalog
from noaa_oracle_spark.sources.reader import read_snapshots

from tests.weather_fixtures import (
    FCST_NEW_FIELDS,
    FCST_OLD_FIELDS,
    _fc_row,
    _write,
    rfc,
)

UTC = timezone.utc
D0 = datetime(2026, 1, 15, tzinfo=UTC)
WIDE_START = datetime(1970, 1, 1, tzinfo=UTC)
WIDE_END = datetime(9999, 1, 1, tzinfo=UTC)


def _snapshot(data_dir: str, gen_h: int, rows, old_schema=False) -> str:
    day = (D0 + timedelta(hours=gen_h)).date().isoformat()
    p = os.path.join(
        data_dir, day,
        f"forecasts_{day}T{gen_h % 24:02d}_10_00+00_00.parquet",
    )
    _write(p, rows, FCST_OLD_FIELDS if old_schema else FCST_NEW_FIELDS)
    return p


def _recompute(spark, data_dir):
    cat = SnapshotCatalog(data_dir)
    fc = read_snapshots(spark, cat.all_paths("forecasts"), "forecasts")
    return forecasts_data(
        fc, generated_start=WIDE_START, generated_end=WIDE_END
    )


def _as_map(df):
    out = {}
    for r in df.collect():
        d = r.asDict()
        out[(d.pop("station_id"), d.pop("date"))] = d
    return out


def _assert_equal(got, want):
    assert got.keys() == want.keys()
    for k in want:
        for col, w in want[k].items():
            g = got[k][col]
            if isinstance(w, float) and w is not None and g is not None:
                assert g == pytest.approx(w, rel=1e-12), (k, col)
            else:
                assert g == w, (k, col)


def test_fold_matches_recompute_per_file(spark, tmp_path):
    data_dir = str(tmp_path / "wd")
    store = LatestForecastStore(str(tmp_path / "state"))

    files = [
        # old-schema file (no snow/ice columns): chained 6h QPF
        (0, [
            _fc_row("KATL", 0, 0, 6, liquid_precipitation_amt=0.10),
            _fc_row("KATL", 0, 6, 6, liquid_precipitation_amt=0.20),
            _fc_row("KATL", 0, 12, 6, liquid_precipitation_amt=0.05),
        ], True),
        # new-schema: snow station + re-forecast of KATL 0-6h (latest wins)
        (2, [
            _fc_row("KBOS", 2, 24, 6, snow_amt=1.0, snow_ratio=10.0),
            _fc_row("KBOS", 2, 30, 6, snow_amt=2.0, snow_ratio=8.0),
            _fc_row("KATL", 2, 0, 6, liquid_precipitation_amt=0.12,
                    max_temp=45),
        ], False),
        # STALE file arriving late: older generated_at for KATL 0-6h —
        # must NOT displace the fresher gen-hour-2 row
        (1, [
            _fc_row("KATL", 1, 0, 6, liquid_precipitation_amt=9.99),
            _fc_row("KSEA", 1, 24, 6, ice_amt=0.2),
        ], False),
        # cross-offset duplicate: same instants as KATL 6-12h in -05:00
        (5, [
            _fc_row(
                "KATL", 5, 6, 6,
                begin_time=rfc(D0 + timedelta(hours=6), -5),
                end_time=rfc(D0 + timedelta(hours=12), -5),
                liquid_precipitation_amt=0.22,
            ),
        ], False),
    ]
    for gen_h, rows, old in files:
        _snapshot(data_dir, gen_h, rows, old_schema=old)
        assert store.refresh(spark, data_dir) == 1
        _assert_equal(
            _as_map(store.serve(spark)),
            _as_map(_recompute(spark, data_dir)),
        )
    assert store.refresh(spark, data_dir) == 0  # no new files → no-op

    # the fresher re-forecast won: day-15 KATL rain uses 0.12, not 9.99
    final = _as_map(store.serve(spark))
    katl = final[("KATL", "2026-01-15")]
    assert katl["rain_amt"] is not None and not math.isnan(katl["rain_amt"])
    assert katl["rain_amt"] < 1.0
    assert katl["temp_high"] == 45


def test_state_stays_bounded(spark, tmp_path):
    """N re-forecasts of the same windows must leave state size constant —
    the whole point of the latest-wins fold."""
    data_dir = str(tmp_path / "wd")
    store = LatestForecastStore(str(tmp_path / "state"))
    for gen_h in range(4):
        _snapshot(
            data_dir, gen_h,
            [_fc_row("KATL", gen_h, 0, 6,
                     liquid_precipitation_amt=0.1 * (gen_h + 1)),
             _fc_row("KATL", gen_h, 6, 6,
                     liquid_precipitation_amt=0.2)],
        )
        store.refresh(spark, data_dir)
        n_state = spark.read.parquet(store._state_path).count()
        assert n_state == 2, n_state


def test_serve_before_refresh_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        LatestForecastStore(str(tmp_path / "s")).serve(spark)
