"""Request-level service layer: the engine side of every weather endpoint.

Replicates the §3.1 query lifecycle of the reference's handlers
(crates/oracle/src/routes/stations/weather_routes.rs): parse request params
→ snapshot file selection with 1-day lookback (file_access.rs:144-233) →
schema-normalized read → DataFrame plan → caller collects/serializes.

| Reference endpoint              | Function here               |
|---------------------------------|-----------------------------|
| GET /stations                   | stations_request            |
| GET /stations/forecasts         | forecasts_request           |
| GET /stations/observations      | observations_request        |
| GET /stations/daily-observations| daily_observations_request  |
| GET /files                      | files_request               |
| browser /raw SQL                | sql/rewriter.run_raw_sql    |

Empty file selection returns a typed empty DataFrame — the engine twin of
the handlers' early-return `[]` (weather_data.rs:440-446).
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from noaa_oracle_spark.queries.weather import (
    daily_observations,
    forecasts_data,
    observation_data,
    stations,
)
from noaa_oracle_spark.sources.catalog import SnapshotCatalog
from noaa_oracle_spark.sources.reader import read_snapshots


def _read(
    spark: SparkSession,
    data_dir: str,
    kind: str,
    start: datetime | None,
    end: datetime | None,
) -> DataFrame:
    cat = SnapshotCatalog(data_dir)
    if start is not None and end is not None:
        paths = cat.list_paths(kind, start, end)
    else:
        paths = cat.all_paths(kind)
    return read_snapshots(spark, paths, kind)


def stations_request(spark: SparkSession, data_dir: str) -> DataFrame:
    """GET /stations — distinct station dim over ALL observation snapshots
    (weather_data.rs:713-733)."""
    return stations(_read(spark, data_dir, "observations", None, None))


def observations_request(
    spark: SparkSession,
    data_dir: str,
    station_ids: Sequence[str] | None = None,
    start: datetime | None = None,
    end: datetime | None = None,
    temperature_unit: str | None = None,
) -> DataFrame:
    """GET /stations/observations (weather_data.rs:426-577)."""
    obs = _read(spark, data_dir, "observations", start, end)
    return observation_data(obs, station_ids, start, end, temperature_unit)


def daily_observations_request(
    spark: SparkSession,
    data_dir: str,
    station_ids: Sequence[str] | None = None,
    start: datetime | None = None,
    end: datetime | None = None,
    temperature_unit: str | None = None,
) -> DataFrame:
    """GET /stations/daily-observations (weather_data.rs:579-704)."""
    obs = _read(spark, data_dir, "observations", start, end)
    return daily_observations(obs, station_ids, start, end, temperature_unit)


def forecasts_request(
    spark: SparkSession,
    data_dir: str,
    station_ids: Sequence[str] | None = None,
    start: datetime | None = None,
    end: datetime | None = None,
    generated_start: datetime | None = None,
    generated_end: datetime | None = None,
    now: datetime | None = None,
    temperature_unit: str | None = None,
) -> DataFrame:
    """GET /stations/forecasts (weather_data.rs:88-424)."""
    fc = _read(spark, data_dir, "forecasts", start, end)
    return forecasts_data(
        fc,
        station_ids=station_ids,
        start=start,
        end=end,
        generated_start=generated_start,
        generated_end=generated_end,
        now=now,
        temperature_unit=temperature_unit,
    )


def files_request(
    data_dir: str,
    start: datetime | None = None,
    end: datetime | None = None,
    kinds: Sequence[str] = ("observations", "forecasts"),
) -> list[str]:
    """GET /files — the snapshot-file catalog (routes/files/get_names.rs)."""
    cat = SnapshotCatalog(data_dir)
    out: list[str] = []
    for kind in kinds:
        if start is not None and end is not None:
            out.extend(cat.list_paths(kind, start, end, lookback_days=0))
        else:
            out.extend(cat.all_paths(kind))
    return sorted(out)
