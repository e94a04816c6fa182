"""DWML flattening as a Spark plan (X5/W3/D4/J9 — daemon parity).

Reference pipeline (crates/daemon/src/domains/forecasts/download_forecast.rs):
  - time-layout slots → TimeRanges; missing end = next start in the same
    layout, else +3 h (estimate_end_time :807-826)
  - grid = ranges deduplicated as UTC instants across layouts — the
    cross-timezone duplicate drop (:420-460, D4)
  - per parameter: containing-interval match with carry-forward for
    instantaneous fields; STRICT exact-interval match, no carry, for
    accumulative precip (add_data :622-805, get_interval :828-:914)
  - NDFD locations matched to the station registry by 2-decimal
    lat/lon equality (:1186-1218, J9)

Spark shape: end-estimation is a LEAD window per (location, layout); the
UTC dedup is dropDuplicates on normalized instants; interval matching is a
priority join resolved by distinct_on; carry-forward is
operators.windows.carry_forward (last ignorenulls). Everything shuffles on
location/station keys only — the natural partitioning at fleet scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from noaa_oracle_spark.operators.dedup import distinct_on
from noaa_oracle_spark.operators.windows import carry_forward

# DWML param → output column (value, unit). Mirrors the WeatherForecast
# row assembly in download_forecast.rs.
PARAM_COLUMNS = {
    "temperature/maximum": ("max_temp", "temperature_unit_code", "long"),
    "temperature/minimum": ("min_temp", "temperature_unit_code", "long"),
    "wind-speed/sustained": ("wind_speed", "wind_speed_unit_code", "long"),
    "direction/wind": ("wind_direction", "wind_direction_unit_code", "long"),
    "humidity/maximum relative": (
        "relative_humidity_max", "relative_humidity_unit_code", "long"),
    "humidity/minimum relative": (
        "relative_humidity_min", "relative_humidity_unit_code", "long"),
    "probability-of-precipitation/12 hour": (
        "twelve_hour_probability_of_precipitation",
        "twelve_hour_probability_of_precipitation_unit_code", "long"),
    "precipitation/liquid": (
        "liquid_precipitation_amt", "liquid_precipitation_unit_code", "double"),
    "precipitation/snow": ("snow_amt", "snow_amt_unit_code", "double"),
    "precipitation/ice": ("ice_amt", "ice_amt_unit_code", "double"),
    "winter-weather-outlook/snow ratio": (
        "snow_ratio", "snow_ratio_unit_code", "double"),
}

ACCUMULATIVE = {
    "precipitation/liquid", "precipitation/snow", "precipitation/ice",
}


def _with_estimated_ends(readings: DataFrame) -> DataFrame:
    """estimate_end_time semantics: next start within the same (location,
    layout), else begin + 3 h.

    Estimated over DISTINCT layout slots, not raw reading rows — several
    parameters share one layout, and a LEAD over the interleaved rows
    would land on the same begin (zero-length windows)."""
    ts = lambda c: F.col(c).cast("timestamp")  # noqa: E731
    slots = (
        readings.select(
            "location_key", "layout_key", "begin_time", "end_time"
        )
        .dropDuplicates(["location_key", "layout_key", "begin_time"])
        .withColumn("begin_ts", ts("begin_time"))
    )
    w = Window.partitionBy("location_key", "layout_key").orderBy("begin_ts")
    slots = slots.select(
        "location_key",
        "layout_key",
        "begin_time",
        "begin_ts",
        F.coalesce(
            ts("end_time"),
            F.lead("begin_ts").over(w),
            F.col("begin_ts") + F.expr("INTERVAL 3 HOURS"),
        ).alias("end_ts"),
        F.col("end_time").isNotNull().alias("had_end"),
    )
    return readings.drop("end_time").join(
        slots, ["location_key", "layout_key", "begin_time"]
    )


def flatten_dwml_readings(readings: DataFrame) -> DataFrame:
    """readings (xml_ingest.READINGS_COLUMNS) → canonical forecast rows.

    One row per (location, UTC-distinct time window) with parameter values
    matched per the reference's interval rules and instantaneous fields
    carried forward."""
    r = _with_estimated_ends(readings)

    # D4: the grid — windows deduplicated as UTC instants across layouts.
    grid = (
        r.select(
            "location_key", "station_id", "latitude", "longitude",
            "generated_at", "begin_ts", "end_ts",
        )
        .dropDuplicates(["location_key", "begin_ts", "end_ts"])
    )

    g = grid.alias("g")
    d = r.alias("d")
    # Priority join reproducing get_interval/get_interval_exact:
    #   1 exact (begin,end); 2 begin-only (layouts without ends);
    #   3 containing [begin, end) — instantaneous params only.
    exact = (F.col("d.begin_ts") == F.col("g.begin_ts")) & (
        F.col("d.end_ts") == F.col("g.end_ts")
    ) & F.col("d.had_end")
    begin_only = (~F.col("d.had_end")) & (
        F.col("d.begin_ts") == F.col("g.begin_ts")
    )
    containing = (
        (F.col("d.begin_ts") <= F.col("g.begin_ts"))
        & (F.col("g.begin_ts") < F.col("d.end_ts"))
    )
    priority = (
        F.when(exact, 1).when(begin_only, 2).when(containing, 3)
    )
    cond = (
        (F.col("d.location_key") == F.col("g.location_key"))
        & (
            F.when(F.col("d.accumulative"), exact | begin_only)
            .otherwise(exact | begin_only | containing)
        )
    )
    matched = g.join(d, cond, "inner").select(
        F.col("g.location_key").alias("location_key"),
        F.col("g.begin_ts").alias("begin_ts"),
        F.col("g.end_ts").alias("end_ts"),
        F.col("d.param").alias("param"),
        F.col("d.value").alias("value"),
        F.col("d.units").alias("units"),
        priority.alias("priority"),
        F.col("d.begin_ts").alias("r_begin"),
    )
    best = distinct_on(
        matched,
        keys=["location_key", "begin_ts", "end_ts", "param"],
        order_by=[F.asc("priority"), F.asc("r_begin")],
    )

    # Pivot params into columns on the grid. Units get per-param aliases
    # first (max_temp and min_temp share temperature_unit_code), then
    # coalesce into the canonical unit columns.
    out = grid
    for param, (vcol, ucol, typ) in PARAM_COLUMNS.items():
        p = best.filter(F.col("param") == param).select(
            "location_key", "begin_ts", "end_ts",
            F.col("value").cast(typ).alias(vcol),
            F.col("units").alias(f"__unit_{vcol}"),
        )
        out = out.join(p, ["location_key", "begin_ts", "end_ts"], "left")
    unit_sources: dict[str, list[str]] = {}
    for _, (vcol, ucol, _) in PARAM_COLUMNS.items():
        unit_sources.setdefault(ucol, []).append(f"__unit_{vcol}")
    for ucol, srcs in unit_sources.items():
        out = out.withColumn(ucol, F.coalesce(*[F.col(s) for s in srcs]))
    out = out.drop(*[s for srcs in unit_sources.values() for s in srcs])

    # W3: carry instantaneous values forward across the grid; accumulative
    # fields are never carried (download_forecast.rs:636-647).
    instantaneous_cols = [
        vcol
        for param, (vcol, _, _) in PARAM_COLUMNS.items()
        if param not in ACCUMULATIVE
    ]
    out = carry_forward(
        out,
        instantaneous_cols,
        partition_by=["location_key"],
        order_by=[F.asc("begin_ts")],
    )
    return out


def attach_stations(
    flattened: DataFrame, stations: DataFrame
) -> DataFrame:
    """J9: resolve DWML locations to the station registry by 2-decimal
    coordinate equality (download_forecast.rs:1186-1218); the registry is a
    tiny dimension → broadcast."""
    key = lambda c: F.format_number(F.col(c).cast("double"), 2)  # noqa: E731
    st = F.broadcast(
        stations.select(
            F.col("station_id").alias("st_station_id"),
            F.col("station_name").alias("st_station_name"),
            F.col("state").alias("st_state"),
            F.col("iata_id").alias("st_iata_id"),
            F.col("elevation_m").alias("st_elevation_m"),
            key("latitude").alias("lat_key"),
            key("longitude").alias("lon_key"),
        )
    )
    joined = flattened.withColumn("lat_key", key("latitude")).withColumn(
        "lon_key", key("longitude")
    ).join(st, ["lat_key", "lon_key"], "left")
    return joined.withColumn(
        "station_id", F.coalesce("station_id", "st_station_id")
    ).drop("lat_key", "lon_key")


def to_forecast_rows(flattened: DataFrame) -> DataFrame:
    """Final projection to the canonical snapshot schema column set
    (schemas.FORECASTS_SCHEMA order), RFC3339 strings for the times."""
    rfc = lambda c: F.date_format(F.col(c), "yyyy-MM-dd'T'HH:mm:ssXXX")  # noqa: E731
    cols = {
        "station_id": F.col("station_id"),
        "station_name": F.coalesce(F.col("st_station_name"), F.lit("")),
        "latitude": F.col("latitude"),
        "longitude": F.col("longitude"),
        "generated_at": F.col("generated_at"),
        "begin_time": rfc("begin_ts"),
        "end_time": rfc("end_ts"),
        "state": F.coalesce(F.col("st_state"), F.lit("")),
        "iata_id": F.coalesce(F.col("st_iata_id"), F.lit("")),
        "elevation_m": F.col("st_elevation_m"),
    }
    from noaa_oracle_spark.schemas import FORECASTS_SCHEMA

    select_cols = []
    flat_cols = set(flattened.columns)
    for field in FORECASTS_SCHEMA.fields:
        if field.name in cols:
            select_cols.append(cols[field.name].alias(field.name))
        elif field.name in flat_cols:
            select_cols.append(
                F.col(field.name).cast(field.dataType).alias(field.name)
            )
        else:
            select_cols.append(
                F.lit(None).cast(field.dataType).alias(field.name)
            )
    return flattened.select(*select_cols).filter(
        F.col("station_id").isNotNull()
    )
