"""Parity against the reference's OWN e2e parquet fixtures
(/root/reference/e2e/fixtures/weather_data/2026-01-17/ — real NOAA data,
old schema: observations 2,469×16, forecasts 606,059×24). The strongest
parity anchor available: our DataFrame queries vs DuckDB running the
reference SQL shapes over the very files the reference's browser tests use.
Also a realistic working-set test — one forecast snapshot here is the same
order of magnitude as sf0.1 lineitem (BASELINE.md).
"""

from __future__ import annotations

import glob
import math
from datetime import datetime, timezone

import duckdb
import pytest

from noaa_oracle_spark.queries.weather import (
    daily_observations,
    forecasts_data,
    observation_data,
    stations,
)
from noaa_oracle_spark.sources.reader import read_snapshots
from noaa_oracle_spark.reference_sql import (
    CLASSIFY,
    FCST_HEADER,
    OBS_AGGS,
    OBS_HEADER,
    duration_ctes as _duration_ctes,
    paths_sql as _paths_sql,
)
from tests.test_weather_parity import normalize

FIXTURE_DIR = "/root/reference/e2e/fixtures/weather_data/2026-01-17"
_RAW_OBS = sorted(glob.glob(f"{FIXTURE_DIR}/observations_*.parquet"))
_RAW_FCST = sorted(glob.glob(f"{FIXTURE_DIR}/forecasts_*.parquet"))

pytestmark = pytest.mark.skipif(
    not _RAW_OBS or not _RAW_FCST,
    reason="reference e2e fixtures not present",
)

# Hadoop's Path rejects ':' in filenames (URI parse), so Spark reads go
# through sanitized symlinks; DuckDB reads the originals directly — both
# engines see the identical bytes.
import os
import tempfile

_LINK_DIR = tempfile.mkdtemp(prefix="ref_fixture_links_")


def _link(paths: list[str]) -> list[str]:
    out = []
    for p in paths:
        safe = os.path.join(_LINK_DIR, os.path.basename(p).replace(":", "_"))
        if not os.path.exists(safe):
            os.symlink(p, safe)
        out.append(safe)
    return out


OBS_PATHS = _link(_RAW_OBS)
FCST_PATHS = _link(_RAW_FCST)

UTC = timezone.utc
START = datetime(2026, 1, 16, tzinfo=UTC)
END = datetime(2026, 1, 25, tzinfo=UTC)
S, E = "2026-01-16T00:00:00Z", "2026-01-25T00:00:00Z"


def compare(sdf, sql, name, con=None):
    srows, scols = sdf.collect(), sdf.columns
    res = (con or duckdb.connect()).execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), name
    assert len(srows) == len(drows), (
        f"{name}: {len(srows)} vs {len(drows)} rows"
    )
    ns = normalize([tuple(r) for r in srows], scols)
    nd = normalize(drows, dcols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatches; first {mismatches[:2]}"


def test_stations_on_reference_fixture(spark):
    obs = read_snapshots(spark, OBS_PATHS, "observations")
    sql = f"""
    SELECT DISTINCT station_id,
        COALESCE(station_name, '') AS station_name,
        COALESCE(state, '') AS state,
        COALESCE(iata_id, '') AS iata_id,
        elevation_m, latitude, longitude
    FROM (
        SELECT NULL::VARCHAR AS station_id, NULL::VARCHAR AS station_name,
               NULL::VARCHAR AS state, NULL::VARCHAR AS iata_id,
               NULL::DOUBLE AS elevation_m, NULL::DOUBLE AS latitude,
               NULL::DOUBLE AS longitude
        WHERE false
        UNION ALL BY NAME
        SELECT * FROM read_parquet([{_paths_sql(OBS_PATHS)}], union_by_name = true)
    )
    """
    compare(stations(obs), sql, "stations@fixture")


def test_daily_observations_on_reference_fixture(spark):
    obs = read_snapshots(spark, OBS_PATHS, "observations")
    sql = f"""
    WITH parquet_data AS (
        SELECT * FROM (
            {OBS_HEADER}
            UNION ALL BY NAME
            SELECT * FROM read_parquet([{_paths_sql(OBS_PATHS)}], union_by_name = true)
        )
    ),
    classified AS (SELECT *, {CLASSIFY} FROM parquet_data)
    SELECT station_id,
        DATE_TRUNC('day', generated_at::TIMESTAMP)::TEXT AS date,
        MIN(temperature_value) FILTER (WHERE temperature_value IS NOT NULL) AS temp_low,
        MAX(temperature_value) FILTER (WHERE temperature_value IS NOT NULL) AS temp_high,
        {OBS_AGGS}
    FROM classified
    GROUP BY station_id, DATE_TRUNC('day', generated_at::TIMESTAMP)::TEXT
    """
    compare(
        daily_observations(obs), sql, "daily_observations@fixture"
    )


def test_observation_data_on_reference_fixture(spark):
    obs = read_snapshots(spark, OBS_PATHS, "observations")
    sql = f"""
    WITH parquet_data AS (
        SELECT * FROM (
            {OBS_HEADER}
            UNION ALL BY NAME
            SELECT * FROM read_parquet([{_paths_sql(OBS_PATHS)}], union_by_name = true)
        )
    ),
    classified AS (SELECT *, {CLASSIFY} FROM parquet_data)
    SELECT station_id,
        MIN(generated_at) AS start_time,
        MAX(generated_at) AS end_time,
        MIN(temperature_value) AS temp_low,
        MAX(temperature_value) AS temp_high,
        {OBS_AGGS}
    FROM classified
    GROUP BY station_id
    """
    compare(observation_data(obs), sql, "observation_data@fixture")


def test_forecasts_data_on_reference_fixture(spark):
    """The full 606k-row forecast pipeline vs the reference SQL — realistic
    per-query working set (one hourly NOAA snapshot)."""
    fc = read_snapshots(spark, FCST_PATHS, "forecasts")
    sql = f"""
    WITH parquet_data AS (
        SELECT * FROM (
            {FCST_HEADER}
            UNION ALL BY NAME
            SELECT * FROM read_parquet([{_paths_sql(FCST_PATHS)}], union_by_name = true)
        )
    ),
    deduped_forecasts AS (
        SELECT DISTINCT ON (station_id, begin_time::TIMESTAMPTZ, end_time::TIMESTAMPTZ)
            station_id, begin_time, end_time, min_temp, max_temp, wind_speed,
            wind_direction, relative_humidity_max, relative_humidity_min,
            temperature_unit_code, twelve_hour_probability_of_precipitation,
            liquid_precipitation_amt, snow_amt, snow_ratio, ice_amt, generated_at
        FROM parquet_data
        ORDER BY station_id, begin_time::TIMESTAMPTZ, end_time::TIMESTAMPTZ, generated_at DESC
    ),
    precip_rows AS (
        SELECT station_id,
            DATE_TRUNC('day', begin_time::TIMESTAMPTZ AT TIME ZONE 'UTC')::TEXT AS date,
            begin_time::TIMESTAMPTZ AS begin_ts,
            end_time::TIMESTAMPTZ AS end_ts,
            EXTRACT(EPOCH FROM (end_time::TIMESTAMPTZ - begin_time::TIMESTAMPTZ)) AS duration_secs,
            liquid_precipitation_amt, snow_amt, snow_ratio, ice_amt
        FROM deduped_forecasts
        WHERE liquid_precipitation_amt IS NOT NULL
           OR snow_amt IS NOT NULL OR ice_amt IS NOT NULL
    ),
    {_duration_ctes("liquid_precipitation_amt", "qpf")},
    {_duration_ctes("snow_amt", "snow")},
    {_duration_ctes("ice_amt", "ice")},
    daily_qpf AS (
        SELECT pr.station_id, pr.date,
            SUM(pr.liquid_precipitation_amt) FILTER (WHERE pr.liquid_precipitation_amt IS NOT NULL AND pr.liquid_precipitation_amt >= 0) AS total_qpf
        FROM precip_rows pr
        LEFT JOIN best_qpf_duration bqd ON pr.station_id = bqd.station_id AND pr.date = bqd.date
        WHERE pr.liquid_precipitation_amt IS NOT NULL
          AND pr.duration_secs = COALESCE(bqd.duration_secs, (
              SELECT MIN(p2.duration_secs) FROM precip_rows p2
              WHERE p2.station_id = pr.station_id AND p2.date = pr.date AND p2.liquid_precipitation_amt IS NOT NULL
          ))
        GROUP BY pr.station_id, pr.date
    ),
    daily_snow AS (
        SELECT pr.station_id, pr.date,
            SUM(pr.snow_amt) FILTER (WHERE pr.snow_amt IS NOT NULL AND pr.snow_amt >= 0) AS snow_amt,
            AVG(pr.snow_ratio) FILTER (WHERE pr.snow_ratio IS NOT NULL AND pr.snow_ratio > 0) AS avg_snow_ratio
        FROM precip_rows pr
        LEFT JOIN best_snow_duration bsd ON pr.station_id = bsd.station_id AND pr.date = bsd.date
        WHERE pr.snow_amt IS NOT NULL
          AND pr.duration_secs = COALESCE(bsd.duration_secs, (
              SELECT MIN(p2.duration_secs) FROM precip_rows p2
              WHERE p2.station_id = pr.station_id AND p2.date = pr.date AND p2.snow_amt IS NOT NULL
          ))
        GROUP BY pr.station_id, pr.date
    ),
    daily_ice AS (
        SELECT pr.station_id, pr.date,
            SUM(pr.ice_amt) FILTER (WHERE pr.ice_amt IS NOT NULL AND pr.ice_amt >= 0) AS ice_amt
        FROM precip_rows pr
        LEFT JOIN best_ice_duration bid ON pr.station_id = bid.station_id AND pr.date = bid.date
        WHERE pr.ice_amt IS NOT NULL
          AND pr.duration_secs = COALESCE(bid.duration_secs, (
              SELECT MIN(p2.duration_secs) FROM precip_rows p2
              WHERE p2.station_id = pr.station_id AND p2.date = pr.date AND p2.ice_amt IS NOT NULL
          ))
        GROUP BY pr.station_id, pr.date
    ),
    daily_precip AS (
        SELECT COALESCE(q.station_id, s.station_id, i.station_id) AS station_id,
               COALESCE(q.date, s.date, i.date) AS date,
               q.total_qpf, s.snow_amt, s.avg_snow_ratio, i.ice_amt
        FROM daily_qpf q
        FULL OUTER JOIN daily_snow s ON q.station_id = s.station_id AND q.date = s.date
        FULL OUTER JOIN daily_ice i ON COALESCE(q.station_id, s.station_id) = i.station_id AND COALESCE(q.date, s.date) = i.date
    ),
    daily_forecasts AS (
        SELECT station_id,
            DATE_TRUNC('day', begin_time::TIMESTAMPTZ AT TIME ZONE 'UTC')::TEXT AS date,
            MIN(begin_time) AS start_time,
            MAX(end_time) AS end_time,
            MIN(min_temp) FILTER (WHERE min_temp IS NOT NULL AND min_temp >= -200 AND min_temp <= 200) AS temp_low,
            MAX(max_temp) FILTER (WHERE max_temp IS NOT NULL AND max_temp >= -200 AND max_temp <= 200) AS temp_high,
            MAX(wind_speed) FILTER (WHERE wind_speed IS NOT NULL AND wind_speed >= 0 AND wind_speed <= 500) AS wind_speed,
            MAX(wind_direction) FILTER (WHERE wind_direction IS NOT NULL AND wind_direction >= 0 AND wind_direction <= 360) AS wind_direction,
            MAX(relative_humidity_max) FILTER (WHERE relative_humidity_max IS NOT NULL AND relative_humidity_max >= 0 AND relative_humidity_max <= 100) AS humidity_max,
            MIN(relative_humidity_min) FILTER (WHERE relative_humidity_min IS NOT NULL AND relative_humidity_min >= 0 AND relative_humidity_min <= 100) AS humidity_min,
            MAX(temperature_unit_code) AS temperature_unit_code,
            MAX(twelve_hour_probability_of_precipitation) FILTER (WHERE twelve_hour_probability_of_precipitation IS NOT NULL) AS precip_chance
        FROM deduped_forecasts
        GROUP BY station_id, DATE_TRUNC('day', begin_time::TIMESTAMPTZ AT TIME ZONE 'UTC')::TEXT
    )
    SELECT df.station_id, df.date,
        MIN(df.start_time) AS start_time,
        MAX(df.end_time) AS end_time,
        MIN(df.temp_low) AS temp_low,
        MAX(df.temp_high) AS temp_high,
        MAX(df.wind_speed) AS wind_speed,
        MAX(df.wind_direction) AS wind_direction,
        MAX(df.humidity_max) AS humidity_max,
        MIN(df.humidity_min) AS humidity_min,
        MAX(df.temperature_unit_code) AS temperature_unit_code,
        MAX(df.precip_chance) AS precip_chance,
        GREATEST(0, COALESCE(
            dp.total_qpf - (dp.snow_amt / NULLIF(dp.avg_snow_ratio, 0)) - COALESCE(dp.ice_amt, 0),
            dp.total_qpf - COALESCE(dp.ice_amt, 0)
        )) AS rain_amt,
        dp.snow_amt AS snow_amt,
        dp.ice_amt AS ice_amt
    FROM daily_forecasts df
    LEFT JOIN daily_precip dp ON df.station_id = dp.station_id AND df.date = dp.date
    GROUP BY df.station_id, df.date, dp.total_qpf, dp.snow_amt, dp.avg_snow_ratio, dp.ice_amt
    """
    compare(forecasts_data(fc), sql, "forecasts_data@fixture")
