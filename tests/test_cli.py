"""Service layer + CLI: the endpoint-for-endpoint switchover surface.

Each CLI subcommand is the reference's GET endpoint; outputs are JSON
lines. main() is driven in-process (it reuses the active SparkSession via
getOrCreate), asserting both the parameter plumbing (station CSV split,
RFC3339 parsing, unit conversion) and the JSON row shape.
"""

from __future__ import annotations

import json

import pytest

from noaa_oracle_spark import service
from noaa_oracle_spark.cli import main
from noaa_oracle_spark.sources.catalog import SnapshotCatalog
from tests.weather_fixtures import (
    write_forecast_fixtures,
    write_observation_fixtures,
)


@pytest.fixture(scope="module")
def data_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_weather"))
    write_observation_fixtures(d)
    write_forecast_fixtures(d)
    return d


def _run(capsys, argv) -> list[dict]:
    assert main(argv) == 0
    out = capsys.readouterr().out
    return [json.loads(line) for line in out.splitlines() if line]


def test_cli_stations(data_dir, capsys):
    rows = _run(capsys, ["stations", "--data-dir", data_dir])
    ids = {r["station_id"] for r in rows}
    assert "KATL" in ids and "KSEA" in ids
    assert all("station_name" in r for r in rows)


def test_cli_observations_filters_and_units(data_dir, capsys, spark):
    argv = [
        "observations", "--data-dir", data_dir,
        "--stations", "KATL, KBOS",
        "--start", "2026-01-15T00:00:00Z",
        "--end", "2026-01-18T00:00:00Z",
        "--temperature-unit", "fahrenheit",
    ]
    rows = _run(capsys, argv)
    assert {r["station_id"] for r in rows} <= {"KATL", "KBOS"}
    direct = {
        r["station_id"]: r.asDict()
        for r in service.observations_request(
            spark, data_dir, ["KATL", "KBOS"],
            __import__("datetime").datetime(
                2026, 1, 15, tzinfo=__import__("datetime").timezone.utc
            ),
            __import__("datetime").datetime(
                2026, 1, 18, tzinfo=__import__("datetime").timezone.utc
            ),
            "fahrenheit",
        ).collect()
    }
    for r in rows:
        want = direct[r["station_id"]]
        assert r["temp_high"] == want["temp_high"]
        assert r["temperature_unit_code"] == "fahrenheit"


def test_cli_daily_observations_limit(data_dir, capsys):
    rows = _run(capsys, [
        "--limit", "2",
        "daily-observations", "--data-dir", data_dir,
        "--start", "2026-01-15T00:00:00Z",
        "--end", "2026-01-18T00:00:00Z",
    ])
    assert len(rows) == 2
    assert all("date" in r for r in rows)


def test_cli_forecasts(data_dir, capsys):
    rows = _run(capsys, [
        "forecasts", "--data-dir", data_dir,
        "--stations", "KATL",
        "--start", "2026-01-15T00:00:00Z",
        "--end", "2026-01-17T00:00:00Z",
        "--generated-start", "2026-01-14T00:00:00Z",
        "--generated-end", "2026-01-16T00:00:00Z",
    ])
    assert rows and all(r["station_id"] == "KATL" for r in rows)
    assert all("rain_amt" in r and "temp_high" in r for r in rows)


def test_cli_files_window(data_dir, capsys):
    rows = _run(capsys, ["files", "--data-dir", data_dir])
    cat = SnapshotCatalog(data_dir)
    assert [r["path"] for r in rows] == sorted(
        cat.all_paths("observations") + cat.all_paths("forecasts")
    )


def test_cli_raw_duckdb_dialect(data_dir, capsys):
    rows = _run(capsys, [
        "raw", "--data-dir", data_dir,
        "--sql",
        "SELECT station_id, count(*) AS n FROM observations "
        "GROUP BY station_id ORDER BY station_id",
    ])
    assert rows and rows[0]["station_id"] < rows[-1]["station_id"]


def test_cli_explain(capsys):
    assert main([
        "explain", "--query", "q72_disjunctive_revenue",
        "--sf-dir", "/root/testdata/sf0.001",
    ]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    # the scale-relevant facts are visible: pushdown + broadcast join
    assert "PushedFilters" in out
    assert "BroadcastHashJoin" in out


def test_cli_explain_unknown_query(capsys):
    assert main(["explain", "--query", "not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err
