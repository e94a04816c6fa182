"""The reference's weather queries, verbatim, as DuckDB SQL builders.

SQL shapes transcribed from /root/reference/crates/oracle/src/db/
weather_data.rs — stations :713-752, observation_data :426-577,
daily_observations :579-704, forecasts_data :90-424. Used by the parity
tests (tests/test_weather_parity.py) as the correctness oracle and by
bench_weather.py as the throughput baseline: running these strings on
DuckDB over the same parquet files IS the reference engine's execution
path (it embeds DuckDB and splices these templates —
weather_data.rs:68-87).
"""

from __future__ import annotations


def paths_sql(paths: list[str]) -> str:
    return ", ".join(f"'{p}'" for p in paths)


OBS_HEADER = """
SELECT NULL::VARCHAR AS station_id, NULL::VARCHAR AS generated_at,
       NULL::DOUBLE AS temperature_value, NULL::BIGINT AS wind_speed,
       NULL::BIGINT AS wind_direction,
       NULL::DOUBLE AS dewpoint_value, NULL::DOUBLE AS precip_in,
       NULL::VARCHAR AS temperature_unit_code,
       NULL::VARCHAR AS wx_string
WHERE false
"""

CLASSIFY = r"""
CASE
    WHEN wx_string IS NOT NULL AND wx_string != '' THEN
        CASE
            WHEN regexp_matches(wx_string, '(^|\s)(SN|BLSN|DRSN)(\s|$)') THEN 'snow'
            WHEN regexp_matches(wx_string, '(^|\s)(FZRA|FZDZ|PL|GR|GS|IC)(\s|$)') THEN 'ice'
            ELSE 'rain'
        END
    WHEN temperature_value IS NOT NULL AND temperature_value <= 2.0 THEN 'snow'
    ELSE 'rain'
END AS precip_type
"""

OBS_AGGS = """
MAX(wind_speed) FILTER (WHERE wind_speed IS NOT NULL AND wind_speed >= 0 AND wind_speed <= 500) AS wind_speed,
MAX(temperature_unit_code) AS temperature_unit_code,
MAX(wind_direction) FILTER (WHERE wind_direction IS NOT NULL AND wind_direction >= 0 AND wind_direction <= 360) AS wind_direction,
CASE
    WHEN AVG(dewpoint_value) IS NOT NULL AND AVG(temperature_value) IS NOT NULL
    THEN ROUND(100.0 * EXP((17.625 * AVG(dewpoint_value)) / (243.04 + AVG(dewpoint_value)))
         / EXP((17.625 * AVG(temperature_value)) / (243.04 + AVG(temperature_value))))::BIGINT
    ELSE NULL
END AS humidity,
SUM(precip_in) FILTER (WHERE precip_in IS NOT NULL AND precip_in >= 0 AND precip_type = 'rain') AS rain_amt,
SUM(precip_in * 10.0) FILTER (WHERE precip_in IS NOT NULL AND precip_in >= 0 AND precip_type = 'snow') AS snow_amt,
SUM(precip_in) FILTER (WHERE precip_in IS NOT NULL AND precip_in >= 0 AND precip_type = 'ice') AS ice_amt
"""

FCST_HEADER = """
SELECT NULL::VARCHAR AS station_id, NULL::VARCHAR AS begin_time, NULL::VARCHAR AS end_time,
       NULL::BIGINT AS min_temp, NULL::BIGINT AS max_temp, NULL::BIGINT AS wind_speed,
       NULL::BIGINT AS wind_direction, NULL::BIGINT AS relative_humidity_max,
       NULL::BIGINT AS relative_humidity_min,
       NULL::VARCHAR AS temperature_unit_code, NULL::DOUBLE AS twelve_hour_probability_of_precipitation,
       NULL::DOUBLE AS liquid_precipitation_amt, NULL::DOUBLE AS snow_amt,
       NULL::DOUBLE AS snow_ratio, NULL::DOUBLE AS ice_amt,
       NULL::VARCHAR AS generated_at
WHERE false
"""


def stations_sql(obs_paths: list[str]) -> str:
    return f"""
    SELECT DISTINCT
        station_id,
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
        SELECT * FROM read_parquet([{paths_sql(obs_paths)}], union_by_name = true)
    )
    """


def _obs_window_cte(paths: list[str], s: str, e: str) -> str:
    return f"""
    WITH parquet_data AS (
        SELECT * FROM (
            {OBS_HEADER}
            UNION ALL BY NAME
            SELECT * FROM read_parquet([{paths_sql(paths)}], union_by_name = true)
        )
        WHERE generated_at::TIMESTAMPTZ >= '{s}'::TIMESTAMPTZ
          AND generated_at::TIMESTAMPTZ <= '{e}'::TIMESTAMPTZ
    ),
    classified AS (SELECT *, {CLASSIFY} FROM parquet_data)
    """


def observation_data_sql(paths: list[str], s: str, e: str) -> str:
    return f"""
    {_obs_window_cte(paths, s, e)}
    SELECT
        station_id,
        GREATEST('{s}', MIN(generated_at)) AS start_time,
        LEAST('{e}', MAX(generated_at)) AS end_time,
        MIN(temperature_value) AS temp_low,
        MAX(temperature_value) AS temp_high,
        {OBS_AGGS}
    FROM classified
    GROUP BY station_id
    """


def daily_observations_sql(paths: list[str], s: str, e: str) -> str:
    return f"""
    {_obs_window_cte(paths, s, e)}
    SELECT
        station_id,
        DATE_TRUNC('day', generated_at::TIMESTAMP)::TEXT AS date,
        MIN(temperature_value) FILTER (WHERE temperature_value IS NOT NULL) AS temp_low,
        MAX(temperature_value) FILTER (WHERE temperature_value IS NOT NULL) AS temp_high,
        {OBS_AGGS}
    FROM classified
    GROUP BY station_id, DATE_TRUNC('day', generated_at::TIMESTAMP)::TEXT
    """


def duration_ctes(field: str, tag: str) -> str:
    return f"""
    {tag}_duration AS (
        SELECT station_id, date, duration_secs, COUNT(*) AS row_count,
            SUM(CASE WHEN next_begin IS NOT NULL AND end_ts = next_begin THEN 1 ELSE 0 END) AS chain_count
        FROM (
            SELECT station_id, date, duration_secs, begin_ts, end_ts,
                LEAD(begin_ts) OVER (PARTITION BY station_id, date, duration_secs ORDER BY begin_ts) AS next_begin
            FROM precip_rows WHERE {field} IS NOT NULL
        ) sub
        GROUP BY station_id, date, duration_secs
        HAVING COUNT(*) > 1
    ),
    best_{tag}_duration AS (
        SELECT DISTINCT ON (station_id, date) station_id, date, duration_secs
        FROM {tag}_duration
        ORDER BY station_id, date, chain_count::FLOAT / row_count DESC, duration_secs ASC
    )"""


def _daily_field_cte(tag: str, field: str, select_aggs: str) -> str:
    return f"""
    daily_{tag} AS (
        SELECT pr.station_id, pr.date,
            {select_aggs}
        FROM precip_rows pr
        LEFT JOIN best_{tag}_duration b{tag} ON pr.station_id = b{tag}.station_id AND pr.date = b{tag}.date
        WHERE pr.{field} IS NOT NULL
          AND pr.duration_secs = COALESCE(b{tag}.duration_secs, (
              SELECT MIN(p2.duration_secs) FROM precip_rows p2
              WHERE p2.station_id = pr.station_id AND p2.date = pr.date AND p2.{field} IS NOT NULL
          ))
        GROUP BY pr.station_id, pr.date
    )"""


def forecasts_data_sql(
    paths: list[str], s: str, e: str, gs: str, ge: str
) -> str:
    return f"""
    WITH parquet_data AS (
        SELECT * FROM (
            {FCST_HEADER}
            UNION ALL BY NAME
            SELECT * FROM read_parquet([{paths_sql(paths)}], union_by_name = true)
        )
    ),
    deduped_forecasts AS (
        SELECT DISTINCT ON (station_id, begin_time::TIMESTAMPTZ, end_time::TIMESTAMPTZ)
            station_id, begin_time, end_time, min_temp, max_temp, wind_speed,
            wind_direction, relative_humidity_max, relative_humidity_min,
            temperature_unit_code, twelve_hour_probability_of_precipitation,
            liquid_precipitation_amt, snow_amt, snow_ratio, ice_amt, generated_at
        FROM parquet_data
        WHERE end_time::TIMESTAMPTZ > '{s}'::TIMESTAMPTZ
          AND begin_time::TIMESTAMPTZ < '{e}'::TIMESTAMPTZ
          AND generated_at::TIMESTAMPTZ >= '{gs}'::TIMESTAMPTZ
          AND generated_at::TIMESTAMPTZ <= '{ge}'::TIMESTAMPTZ
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
    {duration_ctes("liquid_precipitation_amt", "qpf")},
    {duration_ctes("snow_amt", "snow")},
    {duration_ctes("ice_amt", "ice")},
    {_daily_field_cte("qpf", "liquid_precipitation_amt",
        "SUM(pr.liquid_precipitation_amt) FILTER (WHERE pr.liquid_precipitation_amt IS NOT NULL AND pr.liquid_precipitation_amt >= 0) AS total_qpf")},
    {_daily_field_cte("snow", "snow_amt",
        "SUM(pr.snow_amt) FILTER (WHERE pr.snow_amt IS NOT NULL AND pr.snow_amt >= 0) AS snow_amt, "
        "AVG(pr.snow_ratio) FILTER (WHERE pr.snow_ratio IS NOT NULL AND pr.snow_ratio > 0) AS avg_snow_ratio")},
    {_daily_field_cte("ice", "ice_amt",
        "SUM(pr.ice_amt) FILTER (WHERE pr.ice_amt IS NOT NULL AND pr.ice_amt >= 0) AS ice_amt")},
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
        GREATEST('{s}', MIN(df.start_time)) AS start_time,
        LEAST('{e}', MAX(df.end_time)) AS end_time,
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
