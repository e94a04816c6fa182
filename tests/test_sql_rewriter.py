"""/raw SQL-surface parity: the reference's canned browser queries
(raw_data.js:546-680, DuckDB dialect) run through rewrite_duckdb_sql on
Spark temp views and are hash-compared against DuckDB executing the original
SQL over tables built the way the browser builds them
(CREATE TABLE … AS read_parquet(union_by_name), raw_data.js:199-218).
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
import pytest

from noaa_oracle_spark.sql import register_raw_tables, rewrite_duckdb_sql
from tests.weather_fixtures import (
    write_forecast_fixtures,
    write_observation_fixtures,
)

RAW_DAILY_OBSERVATIONS = r"""
WITH classified AS (
    SELECT *,
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
    FROM observations
)
SELECT
    station_id,
    DATE_TRUNC('day', generated_at::TIMESTAMP)::TEXT AS date,
    MIN(temperature_value) FILTER (WHERE temperature_value IS NOT NULL) AS temp_low,
    MAX(temperature_value) FILTER (WHERE temperature_value IS NOT NULL) AS temp_high,
    MAX(wind_speed) FILTER (WHERE wind_speed IS NOT NULL AND wind_speed >= 0 AND wind_speed <= 500) AS wind_speed,
    MAX(wind_direction) FILTER (WHERE wind_direction IS NOT NULL AND wind_direction >= 0 AND wind_direction <= 360) AS wind_direction,
    MAX(temperature_unit_code) AS temperature_unit_code,
    CASE
        WHEN AVG(dewpoint_value) IS NOT NULL AND AVG(temperature_value) IS NOT NULL
        THEN ROUND(100.0 * EXP((17.625 * AVG(dewpoint_value)) / (243.04 + AVG(dewpoint_value)))
             / EXP((17.625 * AVG(temperature_value)) / (243.04 + AVG(temperature_value))))::BIGINT
        ELSE NULL
    END AS humidity,
    SUM(precip_in) FILTER (WHERE precip_in IS NOT NULL AND precip_in >= 0 AND precip_type = 'rain') AS rain_amt,
    SUM(precip_in * 10.0) FILTER (WHERE precip_in IS NOT NULL AND precip_in >= 0 AND precip_type = 'snow') AS snow_amt,
    SUM(precip_in) FILTER (WHERE precip_in IS NOT NULL AND precip_in >= 0 AND precip_type = 'ice') AS ice_amt
FROM classified
GROUP BY station_id, DATE_TRUNC('day', generated_at::TIMESTAMP)::TEXT
ORDER BY station_id, date
"""

RAW_DAILY_FORECAST = """
WITH deduped_forecasts AS (
    SELECT DISTINCT ON (station_id, begin_time, end_time)
        station_id, begin_time, end_time, min_temp, max_temp,
        wind_speed, wind_direction, relative_humidity_max, relative_humidity_min,
        temperature_unit_code, twelve_hour_probability_of_precipitation,
        liquid_precipitation_amt, snow_amt, snow_ratio, ice_amt, generated_at
    FROM forecasts
    ORDER BY station_id, begin_time, end_time, generated_at DESC
),
daily_forecasts AS (
    SELECT
        station_id,
        DATE_TRUNC('day', begin_time::TIMESTAMP)::TEXT AS date,
        MIN(begin_time) AS start_time,
        MAX(end_time) AS end_time,
        MIN(min_temp) FILTER (WHERE min_temp IS NOT NULL AND min_temp >= -200 AND min_temp <= 200) AS temp_low,
        MAX(max_temp) FILTER (WHERE max_temp IS NOT NULL AND max_temp >= -200 AND max_temp <= 200) AS temp_high,
        MAX(wind_speed) FILTER (WHERE wind_speed IS NOT NULL AND wind_speed >= 0 AND wind_speed <= 500) AS wind_speed,
        MAX(wind_direction) FILTER (WHERE wind_direction IS NOT NULL AND wind_direction >= 0 AND wind_direction <= 360) AS wind_direction,
        MAX(relative_humidity_max) FILTER (WHERE relative_humidity_max IS NOT NULL AND relative_humidity_max >= 0 AND relative_humidity_max <= 100) AS humidity_max,
        MIN(relative_humidity_min) FILTER (WHERE relative_humidity_min IS NOT NULL AND relative_humidity_min >= 0 AND relative_humidity_min <= 100) AS humidity_min,
        MAX(temperature_unit_code) AS temperature_unit_code,
        MAX(twelve_hour_probability_of_precipitation) FILTER (WHERE twelve_hour_probability_of_precipitation IS NOT NULL) AS precip_chance,
        SUM(liquid_precipitation_amt) FILTER (WHERE liquid_precipitation_amt IS NOT NULL AND liquid_precipitation_amt >= 0) AS total_qpf,
        SUM(snow_amt) FILTER (WHERE snow_amt IS NOT NULL AND snow_amt >= 0) AS snow_amt,
        AVG(snow_ratio) FILTER (WHERE snow_ratio IS NOT NULL AND snow_ratio > 0) AS avg_snow_ratio,
        SUM(ice_amt) FILTER (WHERE ice_amt IS NOT NULL AND ice_amt >= 0) AS ice_amt
    FROM deduped_forecasts
    GROUP BY station_id, DATE_TRUNC('day', begin_time::TIMESTAMP)::TEXT
)
SELECT
    station_id, date, MIN(start_time) AS start_time, MAX(end_time) AS end_time,
    MIN(temp_low) AS temp_low, MAX(temp_high) AS temp_high,
    MAX(wind_speed) AS wind_speed, MAX(wind_direction) AS wind_direction,
    MAX(humidity_max) AS humidity_max, MIN(humidity_min) AS humidity_min,
    MAX(temperature_unit_code) AS temperature_unit_code,
    MAX(precip_chance) AS precip_chance,
    GREATEST(0, COALESCE(
        SUM(total_qpf) - (SUM(snow_amt) / NULLIF(AVG(avg_snow_ratio), 0)) - COALESCE(SUM(ice_amt), 0),
        SUM(total_qpf) - COALESCE(SUM(ice_amt), 0)
    )) AS rain_amt,
    SUM(snow_amt) AS snow_amt,
    SUM(ice_amt) AS ice_amt
FROM daily_forecasts
GROUP BY station_id, date
ORDER BY station_id, date
"""

RAW_FORECAST_VS_OBSERVED = """
WITH deduped_forecasts AS (
    SELECT DISTINCT ON (station_id, begin_time, end_time)
        station_id, begin_time, end_time, min_temp, max_temp, generated_at
    FROM forecasts
    ORDER BY station_id, begin_time, end_time, generated_at DESC
),
daily_fcst AS (
    SELECT
        station_id,
        DATE_TRUNC('day', begin_time::TIMESTAMP)::TEXT AS date,
        MIN(min_temp) FILTER (WHERE min_temp >= -200 AND min_temp <= 200) AS temp_low,
        MAX(max_temp) FILTER (WHERE max_temp >= -200 AND max_temp <= 200) AS temp_high
    FROM deduped_forecasts
    GROUP BY station_id, DATE_TRUNC('day', begin_time::TIMESTAMP)::TEXT
),
daily_obs AS (
    SELECT
        station_id,
        DATE_TRUNC('day', generated_at::TIMESTAMP)::TEXT AS date,
        MIN(temperature_value) FILTER (WHERE temperature_value IS NOT NULL) AS temp_low,
        MAX(temperature_value) FILTER (WHERE temperature_value IS NOT NULL) AS temp_high
    FROM observations
    GROUP BY station_id, DATE_TRUNC('day', generated_at::TIMESTAMP)::TEXT
)
SELECT
    f.station_id, f.date,
    f.temp_high AS forecast_high, f.temp_low AS forecast_low,
    o.temp_high AS observed_high, o.temp_low AS observed_low,
    f.temp_high - o.temp_high AS high_error,
    f.temp_low - o.temp_low AS low_error
FROM daily_fcst f
JOIN daily_obs o ON f.station_id = o.station_id AND f.date = o.date
ORDER BY f.station_id, f.date
"""

RAW_STATIONS = """
SELECT DISTINCT
    station_id,
    COALESCE(station_name, '') AS station_name,
    COALESCE(state, '') AS state,
    COALESCE(iata_id, '') AS iata_id,
    elevation_m, latitude, longitude
FROM observations
ORDER BY state, station_id
"""

RAW_QUERIES = {
    "daily_observations": RAW_DAILY_OBSERVATIONS,
    "daily_forecast": RAW_DAILY_FORECAST,
    "forecast_vs_observed": RAW_FORECAST_VS_OBSERVED,
    "stations": RAW_STATIONS,
}


RAW_QUERIES["strftime_bucket"] = """
SELECT station_id,
       strftime(generated_at::TIMESTAMP, '%Y-%m-%d %H:%M') AS minute_bucket,
       count(*) AS n
FROM observations GROUP BY 1, 2
"""

# '.' separator: DuckDB splits literally; unescaped it would be a
# match-anything REGEX in Spark's split() — the rewrite must escape it
RAW_QUERIES["epoch_and_split"] = """
SELECT station_id,
       epoch_us(generated_at::TIMESTAMP) AS gen_us,
       string_split(station_id, '.') AS dot_parts,
       string_split(wx_string, ' ') AS words
FROM observations
"""


@pytest.fixture(scope="module")
def raw_env(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("raw_weather"))
    obs = write_observation_fixtures(d)
    fcs = write_forecast_fixtures(d)
    register_raw_tables(spark, d)
    con = duckdb.connect()
    obs_list = ", ".join(f"'{p}'" for p in obs)
    fc_list = ", ".join(f"'{p}'" for p in fcs)
    con.execute(
        f"CREATE TABLE observations AS SELECT * FROM "
        f"read_parquet([{obs_list}], union_by_name = true)"
    )
    con.execute(
        f"CREATE TABLE forecasts AS SELECT * FROM "
        f"read_parquet([{fc_list}], union_by_name = true)"
    )
    return con


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v:.9g}"
        if isinstance(v, datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S")
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(RAW_QUERIES))
def test_raw_query_parity(spark, raw_env, name):
    sql = RAW_QUERIES[name]
    sdf = spark.sql(rewrite_duckdb_sql(sql))
    srows, scols = sdf.collect(), sdf.columns
    res = raw_env.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert _norm([tuple(r) for r in srows], scols) == _norm(drows, dcols), name


def test_rewriter_units():
    out = rewrite_duckdb_sql(
        "SELECT DISTINCT ON (a, b) a, b, c FROM t ORDER BY a, b, c DESC"
    )
    assert "row_number() OVER (PARTITION BY a, b ORDER BY c DESC)" in out
    assert "__rn = 1" in out

    out = rewrite_duckdb_sql("SELECT x::TEXT, y::TIMESTAMPTZ FROM t")
    assert "x::STRING" in out and "y::TIMESTAMP" in out

    out = rewrite_duckdb_sql(
        "SELECT DATE_TRUNC('day', ts::TIMESTAMPTZ AT TIME ZONE 'UTC')::TEXT FROM t"
    )
    assert "CAST(DATE_TRUNC('day', ts::TIMESTAMP) AS DATE)::STRING" in out

    out = rewrite_duckdb_sql(
        "SELECT EXTRACT(EPOCH FROM (end_ts - begin_ts)) FROM t"
    )
    assert "unix_timestamp(end_ts ) - unix_timestamp( begin_ts)" in out.replace(
        "(unix_timestamp(end_ts ) - unix_timestamp( begin_ts))",
        "unix_timestamp(end_ts ) - unix_timestamp( begin_ts)"
    )
    assert "EPOCH" not in out


QUALIFY_QUERIES = {
    "alias_pred": """
SELECT station_id, generated_at,
       row_number() OVER (PARTITION BY station_id
                          ORDER BY generated_at DESC) AS rn
FROM observations
QUALIFY rn = 1
""",
    "star_inline_window": """
SELECT * FROM observations
QUALIFY row_number() OVER (PARTITION BY station_id
                           ORDER BY generated_at DESC, temperature_value) = 1
""",
    "explicit_inline_window_ordered": """
SELECT station_id, temperature_value AS temp
FROM observations
QUALIFY rank() OVER (PARTITION BY station_id
                     ORDER BY generated_at) <= 2
ORDER BY station_id, temp
LIMIT 10
""",
    "subquery_qualify": """
SELECT station_id, count(*) AS n
FROM (
    SELECT station_id, generated_at
    FROM observations
    QUALIFY row_number() OVER (PARTITION BY station_id
                               ORDER BY generated_at) <= 3
) t
GROUP BY station_id
""",
}


@pytest.mark.parametrize("name", sorted(QUALIFY_QUERIES))
def test_qualify_parity(spark, raw_env, name):
    """QUALIFY (DuckDB dialect, not in Spark SQL) must produce identical
    results through the rewriter as DuckDB running the original."""
    sql = QUALIFY_QUERIES[name]
    sdf = spark.sql(rewrite_duckdb_sql(sql))
    srows, scols = sdf.collect(), sdf.columns
    res = raw_env.execute(sql)
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols), name
    assert _norm([tuple(r) for r in srows], scols) == _norm(
        res.fetchall(), dcols
    ), name


def test_qualify_units():
    out = rewrite_duckdb_sql("SELECT a, b AS x FROM t QUALIFY x > 1")
    assert "WHERE x > 1" in out and "__qsub" in out

    out = rewrite_duckdb_sql(
        "SELECT * FROM t QUALIFY row_number() OVER (ORDER BY a) = 1"
    )
    assert "struct(*) AS __row" in out and "__row.*" in out

    with pytest.raises(ValueError):
        rewrite_duckdb_sql(
            "SELECT DISTINCT a FROM t QUALIFY row_number() OVER (ORDER BY a) = 1"
        )


AGG_FN_QUERIES = {
    "arg_max_min": """
SELECT station_id,
       arg_max(generated_at,
               temperature_value
               + 1e-12 * epoch(generated_at::TIMESTAMPTZ)) AS hottest_at,
       arg_min(generated_at,
               temperature_value
               + 1e-12 * epoch(generated_at::TIMESTAMPTZ)) AS coldest_at
FROM observations
WHERE temperature_value IS NOT NULL
GROUP BY station_id
""",
    "string_agg_ordered": """
SELECT station_id,
       string_agg(wx_string, '|' ORDER BY generated_at) AS wx_seq
FROM observations
WHERE wx_string IS NOT NULL AND wx_string != ''
GROUP BY station_id
""",
    "list_agg_sorted": """
SELECT station_id,
       list_sort(list(DISTINCT wx_string)) AS wx_kinds
FROM observations
WHERE wx_string IS NOT NULL AND wx_string != ''
GROUP BY station_id
""",
}


@pytest.mark.parametrize("name", sorted(AGG_FN_QUERIES))
def test_duckdb_agg_fn_parity(spark, raw_env, name):
    """arg_max/arg_min → max_by/min_by, string_agg ORDER BY → listagg
    WITHIN GROUP, list() → collect_list: same results as DuckDB."""
    sql = AGG_FN_QUERIES[name]
    sdf = spark.sql(rewrite_duckdb_sql(sql))
    srows, scols = sdf.collect(), sdf.columns
    res = raw_env.execute(sql)
    dcols = [d[0] for d in res.description]

    def flat(rows):
        return _norm(
            [tuple(tuple(v) if isinstance(v, list) else v for v in r)
             for r in rows],
            dcols,
        )

    assert sorted(scols) == sorted(dcols), name
    assert flat([tuple(r) for r in srows]) == flat(res.fetchall()), name


def test_string_agg_units():
    out = rewrite_duckdb_sql("SELECT string_agg(x, ',' ORDER BY y DESC) FROM t")
    assert "listagg(x, ',') WITHIN GROUP (ORDER BY y DESC)" in out
    out = rewrite_duckdb_sql("SELECT string_agg(x, '-') FROM t")
    assert "listagg(x, '-')" in out
    out = rewrite_duckdb_sql("SELECT arg_max(a, b), arg_min(c, d) FROM t")
    assert "max_by(a, b)" in out and "min_by(c, d)" in out


DIALECT_QUERIES = {
    # star-EXCLUDE → star-EXCEPT; GROUP BY ALL / ORDER BY ALL are native in
    # BOTH engines and must survive the rewriter untouched.
    "star_exclude_parens": """
SELECT * EXCLUDE (latitude, longitude, station_name) FROM observations
WHERE wind_speed IS NOT NULL
""",
    "star_exclude_bare": """
SELECT * EXCLUDE station_name FROM observations WHERE temperature_value > 0
""",
    "group_by_all": """
SELECT station_id, temperature_unit_code, count(*) AS n,
       max(wind_speed) AS max_wind
FROM observations GROUP BY ALL
""",
    "order_by_all_limited": """
SELECT station_id, count(*) AS n FROM observations
GROUP BY ALL ORDER BY ALL
""",
}


@pytest.mark.parametrize("name", sorted(DIALECT_QUERIES))
def test_dialect_star_and_all_parity(spark, raw_env, name):
    sql = DIALECT_QUERIES[name]
    sdf = spark.sql(rewrite_duckdb_sql(sql))
    srows, scols = sdf.collect(), sdf.columns
    res = raw_env.execute(sql)
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols), name
    assert _norm([tuple(r) for r in srows], scols) == _norm(
        res.fetchall(), dcols
    ), name


def test_exclude_units():
    out = rewrite_duckdb_sql("SELECT * EXCLUDE (a, b) FROM t")
    assert "* EXCEPT (a, b)" in out
    out = rewrite_duckdb_sql("SELECT * EXCLUDE c FROM t")
    assert "* EXCEPT (c)" in out
    # set-operation EXCEPT is untouched
    out = rewrite_duckdb_sql("SELECT a FROM t EXCEPT SELECT a FROM u")
    assert "EXCEPT SELECT" in out
