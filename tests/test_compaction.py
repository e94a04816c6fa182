"""Snapshot compaction: query invisibility, catalog overlap pruning, and
sorted layout (row-group station clustering for min/max skipping)."""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import pyarrow.parquet as pq
import pytest

from noaa_oracle_spark.queries.weather import daily_observations, stations
from noaa_oracle_spark.sources.catalog import (
    SnapshotCatalog,
    parse_snapshot_name,
)
from noaa_oracle_spark.sources.compaction import (
    compact_date_dir,
    plan_compaction,
)
from noaa_oracle_spark.sources.reader import read_snapshots

from tests.weather_fixtures import OBS_NEW_FIELDS, OBS_OLD_FIELDS, _obs_row, _write, rfc

UTC = timezone.utc
DAY = "2026-01-15"
D0 = datetime(2026, 1, 15, tzinfo=UTC)

STATIONS = ["KATL", "KBOS", "KDEN", "KJFK", "KSEA"]


def _write_hourly_snapshots(data_dir: str) -> list[str]:
    """Six hourly observation files in one date dir; hours 0-1 use the old
    16-col schema (pre precip_in/wx_string), hours 2-5 the new schema."""
    paths = []
    for hour in range(6):
        rows = []
        for s in STATIONS:
            kw = {"generated_at": rfc(D0 + timedelta(hours=hour))}
            if hour >= 2:
                kw.update(precip_in=0.1 * hour, precip_unit_code="inches",
                          wx_string="RA" if s != "KDEN" else "SN")
            rows.append(_obs_row(s, hour, **kw))
        fields = OBS_OLD_FIELDS if hour < 2 else OBS_NEW_FIELDS
        p = os.path.join(
            data_dir, DAY,
            f"observations_2026-01-15T{hour:02d}_00_00+00_00.parquet",
        )
        _write(p, rows, fields)
        paths.append(p)
    return paths


@pytest.fixture()
def data_dir(tmp_path):
    d = str(tmp_path / "weather_data")
    _write_hourly_snapshots(d)
    return d


def _daily(spark, data_dir, start, end):
    cat = SnapshotCatalog(data_dir)
    paths = cat.list_paths("observations", start, end)
    obs = read_snapshots(spark, paths, "observations")
    return sorted(
        tuple(r) for r in daily_observations(
            obs, start=start, end=end
        ).collect()
    )


def test_compaction_is_query_invisible(spark, data_dir):
    windows = [
        (D0, D0 + timedelta(hours=6)),            # whole day
        (D0 + timedelta(hours=2), D0 + timedelta(hours=4)),  # mid-day slice
        (D0 + timedelta(hours=5), D0 + timedelta(days=2)),   # tail + beyond
    ]
    before = [_daily(spark, data_dir, s, e) for s, e in windows]
    cat = SnapshotCatalog(data_dir)
    stations_before = sorted(
        tuple(r)
        for r in stations(
            read_snapshots(spark, cat.all_paths("observations"), "observations")
        ).collect()
    )

    target = compact_date_dir(spark, data_dir, DAY, "observations",
                              target_file_bytes=1 << 30)
    assert target is not None and os.path.exists(target)
    # sources gone; exactly one catalog entry left for the day
    names = sorted(os.listdir(os.path.join(data_dir, DAY)))
    assert names == [os.path.basename(target)]

    after = [_daily(spark, data_dir, s, e) for s, e in windows]
    assert before == after
    stations_after = sorted(
        tuple(r)
        for r in stations(
            read_snapshots(spark, cat.all_paths("observations"), "observations")
        ).collect()
    )
    assert stations_before == stations_after
    # rows in a mid-day window actually exist (pruning didn't drop the file)
    assert len(after[1]) > 0


def test_compacted_name_parses_with_interval(spark, data_dir):
    plan = plan_compaction(data_dir, DAY, "observations")
    assert plan is not None and plan.n_output_files == 1
    name = os.path.basename(plan.target_path)
    sf = parse_snapshot_name(name, "observations")
    assert sf is not None
    assert sf.lo == D0 and sf.snapshot_ts == D0 + timedelta(hours=5)
    # overlap pruning: window strictly inside the interval still selects it
    compact_date_dir(spark, data_dir, DAY, "observations")
    cat = SnapshotCatalog(data_dir)
    mid = cat.list_paths(
        "observations",
        D0 + timedelta(hours=2),
        D0 + timedelta(hours=3),
        lookback_days=0,
    )
    assert len(mid) == 1
    # window entirely after the interval (beyond lookback) excludes it
    late = cat.list_paths(
        "observations",
        D0 + timedelta(days=3),
        D0 + timedelta(days=4),
        lookback_days=1,
    )
    assert late == []


def test_compaction_sorts_by_station(spark, data_dir):
    target = compact_date_dir(spark, data_dir, DAY, "observations",
                              target_file_bytes=1 << 30)
    parts = [
        os.path.join(target, n)
        for n in os.listdir(target)
        if n.endswith(".parquet")
    ]
    assert parts
    # within every row group, station_id must be sorted (clustered layout →
    # tight min/max stats → row-group skipping on station IN-lists)
    for p in parts:
        pf = pq.ParquetFile(p)
        for rg in range(pf.num_row_groups):
            col = pf.read_row_group(rg, columns=["station_id"])
            vals = col.column(0).to_pylist()
            assert vals == sorted(vals)


def test_noop_on_single_file(spark, tmp_path):
    d = str(tmp_path / "wd")
    rows = [_obs_row("KATL", 0)]
    _write(
        os.path.join(d, DAY, "observations_2026-01-15T00_00_00+00_00.parquet"),
        rows,
        OBS_OLD_FIELDS,
    )
    assert plan_compaction(d, DAY, "observations") is None
    assert compact_date_dir(spark, d, DAY, "observations") is None


def test_parquet_file_count_escapes_glob_metacharacters(spark, tmp_path):
    """r12 review: the globStatus rewrite treated the PATH as a glob,
    so an index rooted at a legally-bracketed directory counted 0
    files — which would make a sink's compaction baseline 0 and fire a
    full compaction every microbatch.  The prefix is now glob-escaped;
    only the *.parquet suffixes glob."""
    from noaa_oracle_spark.pipeline.text import _parquet_file_count

    d = str(tmp_path / "run[1]" / "idx")
    df = spark.range(10).coalesce(2)
    df.write.parquet(d)
    plain = str(tmp_path / "plain")
    df.write.parquet(plain)
    want = _parquet_file_count(spark, plain)
    assert want > 0
    assert _parquet_file_count(spark, d) == want
