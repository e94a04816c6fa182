"""Parity tests: the engine's weather queries vs a DuckDB oracle running the
reference's query semantics verbatim (SQL shapes from
/root/reference/crates/oracle/src/db/weather_data.rs — stations :713-752,
observation_data :426-577, daily_observations :579-704, forecasts_data
:90-424) over the same fixture parquet files, including old/new schema mix.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone

import duckdb
import pytest

from noaa_oracle_spark.queries.weather import (
    daily_observations,
    forecasts_data,
    observation_data,
    stations,
)
from noaa_oracle_spark.reference_sql import (
    daily_observations_sql,
    forecasts_data_sql,
    observation_data_sql,
    stations_sql,
)
from noaa_oracle_spark.sources.catalog import SnapshotCatalog
from noaa_oracle_spark.sources.reader import read_snapshots
from tests.weather_fixtures import (
    write_forecast_fixtures,
    write_observation_fixtures,
)

UTC = timezone.utc
D0 = datetime(2026, 1, 15, tzinfo=UTC)


@pytest.fixture(scope="module")
def weather_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("weather_data"))
    obs = write_observation_fixtures(d)
    fcs = write_forecast_fixtures(d)
    return {"dir": d, "obs": obs, "fcst": fcs}


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        if isinstance(v, datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S")
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def compare(sdf, sql, name):
    srows, scols = sdf.collect(), sdf.columns
    res = duckdb.connect().execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), (
        f"{name} cols: {sorted(scols)} vs {sorted(dcols)}"
    )
    ns, nd = normalize([tuple(r) for r in srows], scols), normalize(drows, dcols)
    assert ns == nd, f"{name}:\nspark={ns}\nduck ={nd}"


def test_stations(spark, weather_dir):
    cat = SnapshotCatalog(weather_dir["dir"])
    obs = read_snapshots(spark, cat.all_paths("observations"), "observations")
    compare(stations(obs), stations_sql(weather_dir["obs"]), "stations")


def test_observation_data(spark, weather_dir):
    cat = SnapshotCatalog(weather_dir["dir"])
    start, end = D0, D0 + timedelta(days=3)
    paths = cat.list_paths("observations", start, end)
    obs = read_snapshots(spark, paths, "observations")
    sql = observation_data_sql(
        paths, "2026-01-15T00:00:00Z", "2026-01-18T00:00:00Z"
    )
    compare(
        observation_data(obs, None, start, end), sql, "observation_data"
    )


def test_daily_observations(spark, weather_dir):
    cat = SnapshotCatalog(weather_dir["dir"])
    start, end = D0, D0 + timedelta(days=3)
    paths = cat.list_paths("observations", start, end)
    obs = read_snapshots(spark, paths, "observations")
    sql = daily_observations_sql(
        paths, "2026-01-15T00:00:00Z", "2026-01-18T00:00:00Z"
    )
    compare(
        daily_observations(obs, None, start, end), sql, "daily_observations"
    )


def test_observation_station_filter_and_unit(spark, weather_dir):
    """Station IN-list + in-plan F conversion parity."""
    cat = SnapshotCatalog(weather_dir["dir"])
    start, end = D0, D0 + timedelta(days=3)
    paths = cat.list_paths("observations", start, end)
    obs = read_snapshots(spark, paths, "observations")
    out = observation_data(
        obs, ["KATL", "KBOS"], start, end, temperature_unit="fahrenheit"
    ).collect()
    assert {r["station_id"] for r in out} == {"KATL", "KBOS"}
    katl = next(r for r in out if r["station_id"] == "KATL")
    # raw temps are °C ('celcius' typo normalized); -1.0 °C → 30.2 °F
    assert katl["temp_low"] == pytest.approx(-1.0 * 9 / 5 + 32)
    assert katl["temperature_unit_code"] == "fahrenheit"


def test_forecasts_data(spark, weather_dir):
    cat = SnapshotCatalog(weather_dir["dir"])
    start, end = D0, D0 + timedelta(days=3)
    gs, ge = D0 - timedelta(days=1), D0 + timedelta(days=1)
    paths = cat.list_paths("forecasts", start, end)
    assert len(paths) == 3
    fc = read_snapshots(spark, paths, "forecasts")
    sql = forecasts_data_sql(
        paths,
        "2026-01-15T00:00:00Z",
        "2026-01-18T00:00:00Z",
        "2026-01-14T00:00:00Z",
        "2026-01-16T00:00:00Z",
    )
    out = forecasts_data(
        fc, None, start, end, generated_start=gs, generated_end=ge
    )
    compare(out, sql, "forecasts_data")


def test_duckdb_string_pushdown_divergence():
    """Documented, deliberate divergence: DuckDB (and therefore the deployed
    reference, weather_data.rs:115-128, which filters with
    `generated_at::TIMESTAMPTZ >= '...'::TIMESTAMPTZ`) rewrites the cast
    comparison into a RAW VARCHAR comparison pushed into the scan —
    EXPLAIN shows `Filters: v>='2026-01-15 00:00:00+00'`. For RFC3339
    strings with non-UTC offsets this string order disagrees with instant
    order, silently dropping in-window rows. Our engine compares true
    instants (functions/weather.ts), which is the reference's *intent*;
    fixtures place offset rows where both semantics agree so the rest of
    the parity suite is unaffected."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v VARCHAR)")
    con.execute("INSERT INTO t VALUES ('2026-01-14T21:00:00-04:00')")
    # instant is 2026-01-15T01:00Z — truly >= the bound…
    instant_ok = con.execute(
        "SELECT v::TIMESTAMPTZ >= TIMESTAMPTZ '2026-01-15 00:00:00+00' "
        "FROM (SELECT v FROM t ORDER BY v) s"
    ).fetchall()
    # …but the column-side cast comparison is string-rewritten and fails.
    pushed = con.execute(
        "SELECT v::TIMESTAMPTZ >= '2026-01-15T00:00:00Z'::TIMESTAMPTZ FROM t"
    ).fetchall()
    assert pushed == [(False,)], "DuckDB pushdown behavior changed"
    assert instant_ok == [(False,)] or instant_ok == [(True,)]


def test_catalog_pruning_and_lookback(weather_dir):
    cat = SnapshotCatalog(weather_dir["dir"])
    # window starting day-16: 1-day lookback pulls the day-15 obs file too
    files = cat.list_files(
        "observations",
        datetime(2026, 1, 16, tzinfo=UTC),
        datetime(2026, 1, 17, tzinfo=UTC),
    )
    assert len(files) == 2
    # without lookback only the day-16 file matches
    files0 = cat.list_files(
        "observations",
        datetime(2026, 1, 16, tzinfo=UTC),
        datetime(2026, 1, 17, tzinfo=UTC),
        lookback_days=0,
    )
    assert len(files0) == 1
    # kind filter separates forecasts from observations
    assert all("observations_" in f.path for f in files)
    # empty window → no files → reader yields empty canonical-schema frame
    none = cat.list_paths(
        "forecasts",
        datetime(2027, 1, 1, tzinfo=UTC),
        datetime(2027, 1, 2, tzinfo=UTC),
    )
    assert none == []
