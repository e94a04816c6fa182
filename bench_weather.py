#!/usr/bin/env python3
"""Weather-engine throughput at the reference's own data scale.

Generates snapshot parquet shaped like the reference's real e2e fixture
(~2,500 stations; forecast snapshots of ~260 k rows × 30 cols vs the
reference's 606 k-row hourly file; 72 hourly observation files — see
BASELINE.md) and times each of the four weather queries two ways:

  spark   — this engine's DataFrame plans (noop sink, warm: 2nd run)
  duckdb  — the reference's execution path, verbatim: a fresh in-memory
            DuckDB connection running the exact SQL templates the reference
            splices (crates/oracle/src/db/weather_data.rs via
            noaa_oracle_spark/reference_sql.py)

Prints one JSON line: {"queries": {name: {"spark_sec", "duckdb_sec",
"rows"}}, ...}. The fixture is cached under /tmp and regenerated only when
its layout version changes.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timedelta, timezone

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from noaa_oracle_spark import reference_sql as ref  # noqa: E402
from noaa_oracle_spark.sources.catalog import snapshot_path  # noqa: E402

UTC = timezone.utc
D0 = datetime(2026, 1, 15, tzinfo=UTC)
N_STATIONS = int(os.environ.get("WEATHER_BENCH_STATIONS", "2500"))
FIXTURE = f"/tmp/noaa_weather_bench_v1_{N_STATIONS}"


def rfc(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%S+00:00")


def _station_ids() -> np.ndarray:
    return np.array([f"S{i:04d}" for i in range(N_STATIONS)])


def _write(path: str, cols: dict) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table(cols), path)


def generate_fixture() -> None:
    """Columnar generation — one forecast layout row per
    (station, day, window), two generated_at snapshots for dedup work."""
    rng = np.random.default_rng(42)
    os.makedirs(f"{FIXTURE}/2026-01-15", exist_ok=True)
    sid = _station_ids()
    # station attributes are stable across snapshots (like real stations —
    # the stations query dedups to one row per station)
    lat = rng.uniform(25, 49, N_STATIONS)
    lon = rng.uniform(-125, -67, N_STATIONS)
    elev = rng.uniform(0, 2000, N_STATIONS)

    # --- forecasts: per station, 7 days × (8×3h + 4×6h + 2×12h + 1×24h)
    windows = (
        [(h, 3) for h in range(0, 24, 3)]
        + [(h, 6) for h in range(0, 24, 6)]
        + [(h, 12) for h in (0, 12)]
        + [(0, 24)]
    )
    per_station = [(d, h, dur) for d in range(7) for (h, dur) in windows]
    n = N_STATIONS * len(per_station)
    st = np.repeat(sid, len(per_station))
    day = np.tile(np.array([w[0] for w in per_station]), N_STATIONS)
    hour = np.tile(np.array([w[1] for w in per_station]), N_STATIONS)
    dur = np.tile(np.array([w[2] for w in per_station]), N_STATIONS)
    begin = [rfc(D0 + timedelta(days=int(d), hours=int(h))) for d, h in zip(day, hour)]
    end = [
        rfc(D0 + timedelta(days=int(d), hours=int(h) + int(u)))
        for d, h, u in zip(day, hour, dur)
    ]

    def opt_int(vals, null_p):
        v = vals.astype("float64")
        v[rng.random(n) < null_p] = np.nan
        return [None if np.isnan(x) else int(x) for x in v]

    def opt_float(vals, null_p):
        v = vals.astype("float64")
        v[rng.random(n) < null_p] = np.nan
        return [None if np.isnan(x) else round(float(x), 2) for x in v]

    for gen_h in (0, 1):
        gen_ts = D0 + timedelta(hours=gen_h)
        gen = rfc(gen_ts)
        _write(
            snapshot_path(FIXTURE, "forecasts", gen_ts),
            {
                "station_id": st,
                "station_name": np.char.add("Station ", sid).repeat(len(per_station))[:n],
                "latitude": np.repeat(lat, len(per_station)),
                "longitude": np.repeat(lon, len(per_station)),
                "generated_at": np.array([gen] * n),
                "begin_time": begin,
                "end_time": end,
                "max_temp": opt_int(rng.integers(-20, 41, n), 0.05),
                "min_temp": opt_int(rng.integers(-30, 31, n), 0.05),
                "temperature_unit_code": np.array(["Fahrenheit"] * n),
                "wind_speed": opt_int(rng.integers(0, 600, n), 0.1),  # some >500
                "wind_speed_unit_code": np.array(["knots"] * n),
                "wind_direction": opt_int(rng.integers(0, 361, n), 0.1),
                "wind_direction_unit_code": np.array(["degrees true"] * n),
                "relative_humidity_max": opt_int(rng.integers(0, 101, n), 0.1),
                "relative_humidity_max_unit_code": np.array(["percent"] * n),
                "relative_humidity_min": opt_int(rng.integers(0, 101, n), 0.1),
                "relative_humidity_min_unit_code": np.array(["percent"] * n),
                "liquid_precipitation_amt": opt_float(rng.random(n) * 2, 0.6),
                "liquid_precipitation_unit_code": np.array(["inches"] * n),
                "twelve_hour_probability_of_precipitation": opt_int(
                    rng.integers(0, 101, n), 0.3
                ),
                "twelve_hour_probability_of_precipitation_unit_code": np.array(
                    ["percent"] * n
                ),
                "state": np.array(["GA"] * n),
                "iata_id": st,
                "elevation_m": np.repeat(elev, len(per_station)),
                "snow_amt": opt_float(rng.random(n) * 5, 0.8),
                "snow_amt_unit_code": np.array(["inches"] * n),
                "snow_ratio": opt_float(rng.uniform(5, 15, n), 0.8),
                "snow_ratio_unit_code": np.array(["ratio"] * n),
                "ice_amt": opt_float(rng.random(n) * 0.5, 0.9),
                "ice_amt_unit_code": np.array(["inches"] * n),
            },
        )

    # --- observations: 72 hourly files × N_STATIONS rows
    wx_pool = np.array(["", "", "", "RA", "SN", "FZRA", "BLSN", "-RA BR", "GR"])
    for h in range(72):
        ts = D0 + timedelta(hours=h)
        d = ts.strftime("%Y-%m-%d")
        os.makedirs(f"{FIXTURE}/{d}", exist_ok=True)
        m = N_STATIONS
        temp = rng.uniform(-15, 35, m)
        _write(
            snapshot_path(FIXTURE, "observations", ts),
            {
                "station_id": sid,
                "station_name": np.char.add("Station ", sid),
                "latitude": lat,
                "longitude": lon,
                "generated_at": np.array([rfc(ts)] * m),
                "temperature_value": [
                    None if rng.random() < 0.05 else round(float(t), 1) for t in temp
                ],
                "temperature_unit_code": np.array(["celcius"] * m),
                "wind_direction": [
                    None if rng.random() < 0.1 else int(x)
                    for x in rng.integers(0, 361, m)
                ],
                "wind_direction_unit_code": np.array(["degrees true"] * m),
                "wind_speed": [
                    None if rng.random() < 0.1 else int(x)
                    for x in rng.integers(0, 120, m)
                ],
                "wind_speed_unit_code": np.array(["knots"] * m),
                "dewpoint_value": [round(float(t) - 2.5, 1) for t in temp],
                "dewpoint_unit_code": np.array(["celcius"] * m),
                "state": np.array(["GA"] * m),
                "iata_id": sid,
                "elevation_m": elev,
                "precip_in": [
                    None if rng.random() < 0.7 else round(float(x), 2)
                    for x in rng.random(m)
                ],
                "precip_unit_code": np.array(["inches"] * m),
                "wx_string": rng.choice(wx_pool, m),
            },
        )
    with open(f"{FIXTURE}/.done", "w") as f:
        f.write("ok")


def main() -> None:
    import duckdb

    from noaa_oracle_spark.queries.weather import (
        daily_observations,
        forecasts_data,
        observation_data,
        stations,
    )
    from noaa_oracle_spark.session import get_spark
    from noaa_oracle_spark.sources.catalog import SnapshotCatalog
    from noaa_oracle_spark.sources.reader import read_snapshots

    if not os.path.exists(f"{FIXTURE}/.done"):
        t0 = time.perf_counter()
        generate_fixture()
        print(f"fixture generated in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    spark = get_spark(app_name="noaa-weather-bench")
    spark.sparkContext.setLogLevel("ERROR")
    cat = SnapshotCatalog(FIXTURE)
    start, end = D0, D0 + timedelta(days=3)
    gs, ge = D0 - timedelta(days=1), D0 + timedelta(days=1)
    s, e = "2026-01-15T00:00:00Z", "2026-01-18T00:00:00Z"
    gss, ges = "2026-01-14T00:00:00Z", "2026-01-16T00:00:00Z"

    obs_paths = cat.list_paths("observations", start, end)
    fc_paths = cat.list_paths("forecasts", start, end)
    obs = read_snapshots(spark, obs_paths, "observations")
    fc = read_snapshots(spark, fc_paths, "forecasts")

    cases = {
        "stations": (
            lambda: stations(obs),
            ref.stations_sql(obs_paths),
        ),
        "observation_data": (
            lambda: observation_data(obs, None, start, end),
            ref.observation_data_sql(obs_paths, s, e),
        ),
        "daily_observations": (
            lambda: daily_observations(obs, None, start, end),
            ref.daily_observations_sql(obs_paths, s, e),
        ),
        "forecasts_data": (
            lambda: forecasts_data(
                fc, None, start, end, generated_start=gs, generated_end=ge
            ),
            ref.forecasts_data_sql(fc_paths, s, e, gss, ges),
        ),
    }

    # Best-of-3 post-warm for BOTH engines: single-shot measurements on a
    # 32-thread scheduler carry 2x run-to-run noise at sub-second query
    # times; the minimum is the steady-state interactive latency a service
    # would observe. DuckDB keeps its reference behavior (fresh in-memory
    # connection per run) inside the loop.
    #
    # Large-scale sweep knobs: WEATHER_BENCH_QUERIES filters the case list
    # (the 16x/32x flagship sweep only needs forecasts_data), and
    # WEATHER_BENCH_DUCKDB_TIMEOUT caps the reference path's wall time by
    # running it in a subprocess — at 16x+ the reference's superlinear
    # growth crosses the hour mark, and ">cap" is itself the measurement.
    reps = int(os.environ.get("WEATHER_BENCH_REPS", "3"))
    only = os.environ.get("WEATHER_BENCH_QUERIES")
    if only:
        keep = {q.strip() for q in only.split(",")}
        cases = {k: v for k, v in cases.items() if k in keep}
    duck_timeout = float(os.environ.get("WEATHER_BENCH_DUCKDB_TIMEOUT", "0"))

    def run_duckdb(sql: str):
        """(best_sec | None-on-timeout, n_rows | None)."""
        if duck_timeout <= 0:
            best, rows = 1e9, []
            for _ in range(reps):
                t0 = time.perf_counter()
                rows = duckdb.connect().execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            return best, len(rows)
        import subprocess
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".sql", delete=False) as f:
            f.write(sql)
            sql_path = f.name
        child = (
            "import json,sys,time,duckdb\n"
            "sql=open(sys.argv[1]).read()\n"
            "t0=time.perf_counter()\n"
            "rows=duckdb.connect().execute(sql).fetchall()\n"
            "print(json.dumps({'sec':time.perf_counter()-t0,'rows':len(rows)}))\n"
        )
        best, n_rows = None, None
        for _ in range(reps):
            try:
                p = subprocess.run(
                    [sys.executable, "-c", child, sql_path],
                    capture_output=True,
                    text=True,
                    timeout=duck_timeout,
                )
                got = json.loads(p.stdout.strip().splitlines()[-1])
            except (subprocess.TimeoutExpired, Exception):
                continue
            best = got["sec"] if best is None else min(best, got["sec"])
            n_rows = got["rows"]
        os.unlink(sql_path)
        return best, n_rows

    out = {}
    for name, (build, sql) in cases.items():
        build().write.format("noop").mode("overwrite").save()  # warm
        spark_sec = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            spark_sec = min(spark_sec, time.perf_counter() - t0)
        duck_sec, duck_rows = run_duckdb(sql)
        out[name] = {
            "spark_sec": round(spark_sec, 3),
            "duckdb_sec": round(duck_sec, 3) if duck_sec is not None else None,
            "rows": duck_rows,
        }
        if duck_sec is None:
            out[name]["duckdb_timeout_sec"] = duck_timeout

    print(
        json.dumps(
            {
                "metric": "weather_engine_vs_reference_duckdb",
                "n_stations": N_STATIONS,
                "obs_rows_scanned": N_STATIONS * len(obs_paths),
                "fcst_rows_scanned": N_STATIONS * 105 * len(fc_paths),
                "queries": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
