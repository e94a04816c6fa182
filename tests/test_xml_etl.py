"""Daemon-parity ETL tests: METAR/DWML XML → canonical snapshot rows.

Covers S11 (XML sources), X5 (DWML flattening: end estimation, exact vs
containing matching), D4 (cross-timezone UTC window dedup), W3 (carry-
forward for instantaneous fields, never for accumulative), J9 (2-dp
coordinate station join), S6 (snapshot write) — and round-trips the result
through the catalog + daily forecast query.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.queries.weather import forecasts_data
from noaa_oracle_spark.sources.catalog import SnapshotCatalog
from noaa_oracle_spark.sources.etl_forecast import (
    attach_stations,
    flatten_dwml_readings,
    to_forecast_rows,
)
from noaa_oracle_spark.sources.reader import read_snapshots
from noaa_oracle_spark.sources.writer import write_snapshot
from noaa_oracle_spark.sources.xml_ingest import dwml_to_readings, metar_to_df

METAR_XML = """<?xml version="1.0"?>
<response>
  <data num_results="2">
    <METAR>
      <raw_text>KATL 150152Z ...</raw_text>
      <station_id>KATL</station_id>
      <observation_time>2026-01-15T01:52:00Z</observation_time>
      <latitude>33.63</latitude>
      <longitude>-84.44</longitude>
      <temp_c>12.8</temp_c>
      <dewpoint_c>7.2</dewpoint_c>
      <wind_dir_degrees>290</wind_dir_degrees>
      <wind_speed_kt>8</wind_speed_kt>
      <elevation_m>313.0</elevation_m>
      <wx_string>-RA BR</wx_string>
      <precip_in>0.02</precip_in>
    </METAR>
    <METAR>
      <raw_text>KBOS 150154Z ...</raw_text>
      <station_id>KBOS</station_id>
      <observation_time>2026-01-15T01:54:00Z</observation_time>
      <latitude>42.36</latitude>
      <longitude>-71.01</longitude>
      <temp_c>-3.0</temp_c>
      <dewpoint_c>-8.0</dewpoint_c>
      <wind_speed_kt>15</wind_speed_kt>
    </METAR>
  </data>
</response>
"""


def test_metar_ingest(spark):
    df = metar_to_df(
        spark, METAR_XML, station_meta={"KATL": {"state": "GA", "iata_id": "ATL"}}
    )
    rows = {r["station_id"]: r for r in df.collect()}
    assert rows["KATL"]["temperature_value"] == 12.8
    assert rows["KATL"]["temperature_unit_code"] == "celcius"
    assert rows["KATL"]["wx_string"] == "-RA BR"
    assert rows["KATL"]["state"] == "GA"
    assert rows["KBOS"]["wind_direction"] is None  # absent element → NULL
    assert rows["KBOS"]["precip_in"] is None
    assert len(df.schema.fields) == 19  # canonical observation schema


# DWML: two locations; layout k-p3h has no end times (begin-only, ends
# estimated from next start / +3h); layout k-p6h has ends, expressed in
# -05:00 for point2 but identical UTC instants (D4 dedup on the grid).
DWML_XML = """<?xml version="1.0"?>
<dwml>
  <head><product><creation-date>2026-01-15T02:00:00Z</creation-date></product></head>
  <data>
    <location>
      <location-key>point1</location-key>
      <station-id>KATL</station-id>
      <point latitude="33.63" longitude="-84.44"/>
    </location>
    <location>
      <location-key>point2</location-key>
      <point latitude="42.36" longitude="-71.01"/>
    </location>
    <time-layout>
      <layout-key>k-p3h</layout-key>
      <start-valid-time>2026-01-15T06:00:00+00:00</start-valid-time>
      <start-valid-time>2026-01-15T09:00:00+00:00</start-valid-time>
      <start-valid-time>2026-01-15T12:00:00+00:00</start-valid-time>
    </time-layout>
    <time-layout>
      <layout-key>k-p6h</layout-key>
      <start-valid-time>2026-01-15T06:00:00+00:00</start-valid-time>
      <end-valid-time>2026-01-15T12:00:00+00:00</end-valid-time>
      <start-valid-time>2026-01-15T12:00:00+00:00</start-valid-time>
      <end-valid-time>2026-01-15T18:00:00+00:00</end-valid-time>
    </time-layout>
    <time-layout>
      <layout-key>k-p6h-est</layout-key>
      <start-valid-time>2026-01-15T01:00:00-05:00</start-valid-time>
      <end-valid-time>2026-01-15T07:00:00-05:00</end-valid-time>
      <start-valid-time>2026-01-15T07:00:00-05:00</start-valid-time>
      <end-valid-time>2026-01-15T13:00:00-05:00</end-valid-time>
    </time-layout>
    <parameters applicable-location="point1">
      <temperature type="maximum" units="Fahrenheit" time-layout="k-p3h">
        <value>40</value>
        <value>45</value>
        <value></value>
      </temperature>
      <precipitation type="liquid" units="inches" time-layout="k-p6h">
        <value>0.10</value>
        <value>0.25</value>
      </precipitation>
      <wind-speed type="sustained" units="knots" time-layout="k-p3h">
        <value>10</value>
        <value>12</value>
        <value>9</value>
      </wind-speed>
    </parameters>
    <parameters applicable-location="point2">
      <temperature type="maximum" units="Fahrenheit" time-layout="k-p6h-est">
        <value>20</value>
        <value>22</value>
      </temperature>
      <precipitation type="snow" units="inches" time-layout="k-p6h-est">
        <value>1.5</value>
        <value>0.5</value>
      </precipitation>
    </parameters>
  </data>
</dwml>
"""


@pytest.fixture(scope="module")
def flattened(spark):
    readings = dwml_to_readings(spark, DWML_XML)
    return flatten_dwml_readings(readings)


def test_dwml_grid_and_matching(flattened):
    p1 = {
        (str(r["begin_ts"]), str(r["end_ts"])): r
        for r in flattened.filter(F.col("location_key") == "point1").collect()
    }
    # grid windows: 3h slots 06-09, 09-12 (ends estimated from next start),
    # 12-15 (+3h fallback), plus 6h slots 06-12, 12-18 — all distinct
    assert set(p1) == {
        ("2026-01-15 06:00:00", "2026-01-15 09:00:00"),
        ("2026-01-15 09:00:00", "2026-01-15 12:00:00"),
        ("2026-01-15 12:00:00", "2026-01-15 15:00:00"),
        ("2026-01-15 06:00:00", "2026-01-15 12:00:00"),
        ("2026-01-15 12:00:00", "2026-01-15 18:00:00"),
    }
    # accumulative liquid: ONLY the exact 6h windows carry it — never the
    # contained 3h slots (strict matching, download_forecast.rs:636-647)
    assert p1[("2026-01-15 06:00:00", "2026-01-15 12:00:00")][
        "liquid_precipitation_amt"
    ] == 0.10
    assert p1[("2026-01-15 06:00:00", "2026-01-15 09:00:00")][
        "liquid_precipitation_amt"
    ] is None
    # instantaneous max_temp: begin-only match on 3h layout; empty third
    # value carried forward from the 09:00 slot (W3)
    assert p1[("2026-01-15 06:00:00", "2026-01-15 09:00:00")]["max_temp"] == 40
    assert p1[("2026-01-15 09:00:00", "2026-01-15 12:00:00")]["max_temp"] == 45
    assert p1[("2026-01-15 12:00:00", "2026-01-15 15:00:00")]["max_temp"] == 45
    # containing match: the 6h window 06-12 picks the 3h reading at 06:00
    assert p1[("2026-01-15 06:00:00", "2026-01-15 12:00:00")]["max_temp"] == 40


def test_dwml_utc_dedup(flattened):
    # point2's -05:00 layout = 06:00Z/12:00Z instants → one UTC grid window
    p2 = flattened.filter(F.col("location_key") == "point2").collect()
    windows = {(str(r["begin_ts"]), str(r["end_ts"])) for r in p2}
    assert windows == {
        ("2026-01-15 06:00:00", "2026-01-15 12:00:00"),
        ("2026-01-15 12:00:00", "2026-01-15 18:00:00"),
    }
    by_win = {(str(r["begin_ts"])): r for r in p2}
    assert by_win["2026-01-15 06:00:00"]["snow_amt"] == 1.5
    assert by_win["2026-01-15 12:00:00"]["snow_amt"] == 0.5


def test_station_attach_and_roundtrip(spark, flattened, tmp_path):
    stations = spark.createDataFrame(
        [
            ("KATL", "Hartsfield", "GA", "ATL", 313.0, 33.63, -84.44),
            ("KBOS", "Logan", "MA", "BOS", 6.0, 42.36, -71.01),
        ],
        "station_id string, station_name string, state string, iata_id string, "
        "elevation_m double, latitude double, longitude double",
    )
    rows = to_forecast_rows(attach_stations(flattened, stations))
    got = {r["station_id"] for r in rows.collect()}
    # point2 had no station-id in the DWML — resolved via 2-dp coordinates
    assert got == {"KATL", "KBOS"}

    # S6: write as a snapshot, re-read through catalog + reader, run the
    # full forecast query over it.
    data_dir = str(tmp_path / "wx")
    ts = datetime(2026, 1, 15, 2, tzinfo=timezone.utc)
    path = write_snapshot(rows, data_dir, "forecasts", ts)
    assert path.endswith("forecasts_2026-01-15T02_00_00+00_00.parquet")

    cat = SnapshotCatalog(data_dir)
    fc = read_snapshots(
        spark,
        cat.list_paths(
            "forecasts",
            datetime(2026, 1, 15, tzinfo=timezone.utc),
            datetime(2026, 1, 16, tzinfo=timezone.utc),
        ),
        "forecasts",
    )
    out = forecasts_data(
        fc,
        None,
        datetime(2026, 1, 15, tzinfo=timezone.utc),
        datetime(2026, 1, 16, tzinfo=timezone.utc),
        generated_start=datetime(2026, 1, 14, tzinfo=timezone.utc),
        generated_end=datetime(2026, 1, 16, tzinfo=timezone.utc),
    ).collect()
    daily = {r["station_id"]: r for r in out}
    assert daily["KATL"]["temp_high"] == 45
    assert daily["KATL"]["rain_amt"] == pytest.approx(0.35)  # 0.10 + 0.25
    assert daily["KBOS"]["snow_amt"] == pytest.approx(2.0)  # 1.5 + 0.5
