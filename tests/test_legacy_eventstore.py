"""Legacy nested (STRUCT/LIST) event-store mirror: struct round-trips
through parquet, positional field extraction with the wind-speed validity
window, junction-joined per-event weather LISTs, and TEXT[] membership.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.eventstore.legacy import (
    LEGACY_EVENT_ARRAYS_SCHEMA,
    LEGACY_EVENTS_WEATHER_SCHEMA,
    LEGACY_WEATHER_SCHEMA,
    event_weather_lists,
    extract_reading,
    reading_struct,
    stations_in_any_event_location,
)

TS = dt.datetime(2026, 1, 15, 12, 0, 0)


def _reading(low, high, wind):
    return (TS, low, high, wind)


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    weather_rows = [
        ("w1", "KATL", _reading(30, 50, 12), _reading(28, 52, 15), TS),
        ("w2", "KSEA", _reading(40, 55, 9000), _reading(41, 57, None), TS),
        ("w3", "KBOS", None, _reading(20, 33, 3000), TS),
    ]
    weather = spark.createDataFrame(weather_rows, LEGACY_WEATHER_SCHEMA)
    junction = spark.createDataFrame(
        [
            ("j1", "e1", "w1"),
            ("j2", "e1", "w2"),
            ("j3", "e2", "w3"),
        ],
        LEGACY_EVENTS_WEATHER_SCHEMA,
    )
    events = spark.createDataFrame(
        [
            ("e1", ["KATL", "KSEA"], ["temp_high", "wind_speed"]),
            ("e2", ["KBOS"], ["temp_low"]),
            ("e3", [], None),
        ],
        LEGACY_EVENT_ARRAYS_SCHEMA,
    )
    # round-trip the nested weather table through parquet — the storage
    # contract (DuckDB STRUCT == parquet group == Spark StructType)
    p = str(tmp_path_factory.mktemp("legacy") / "weather")
    weather.write.parquet(p)
    return spark.read.parquet(p), junction, events


def test_struct_roundtrip_preserves_nested_values(spark, tables):
    weather, _, _ = tables
    assert weather.schema["observed"].dataType == LEGACY_WEATHER_SCHEMA[
        "observed"
    ].dataType
    row = {r.id: r for r in weather.collect()}
    assert row["w1"].observed.temp_high == 50
    assert row["w3"].observed is None
    assert row["w2"].forecasted.wind_speed is None


def test_extract_reading_applies_wind_validity(tables):
    weather, _, _ = tables
    obs = {r.id: r for r in extract_reading(weather, "observed").collect()}
    assert obs["w1"].wind_speed == 12
    assert obs["w2"].wind_speed is None  # 9000 outside 0..=3000 -> NULL
    assert obs["w3"].temp_low is None  # missing struct -> NULL fields
    fc = {r.id: r for r in extract_reading(weather, "forecasted").collect()}
    assert fc["w3"].wind_speed == 3000  # boundary inclusive
    with pytest.raises(ValueError):
        extract_reading(weather, "banana")


def test_reading_struct_builder_matches_schema(spark):
    df = spark.range(1).select(
        reading_struct(
            F.lit(TS).cast("timestamp"), F.lit(1), F.lit(2), F.lit(3)
        ).alias("r")
    )
    assert [f.name for f in df.schema["r"].dataType.fields] == [
        "reading_date", "temp_low", "temp_high", "wind_speed",
    ]
    r = df.collect()[0].r
    assert (r.temp_low, r.temp_high, r.wind_speed) == (1, 2, 3)


def test_event_weather_lists_deterministic(tables):
    weather, junction, _ = tables
    out = {r.event_id: r for r in
           event_weather_lists(junction, weather).collect()}
    assert out["e1"].n_weather == 2
    assert [w.id for w in out["e1"].weather] == ["w1", "w2"]  # id-sorted
    assert out["e1"].weather[0].observed.temp_high == 50
    assert [w.id for w in out["e2"].weather] == ["w3"]


def test_text_array_membership(tables):
    weather, _, events = tables
    pairs = {
        (r.event_id, r.station_id)
        for r in stations_in_any_event_location(weather, events).collect()
    }
    assert pairs == {("e1", "KATL"), ("e1", "KSEA"), ("e2", "KBOS")}
