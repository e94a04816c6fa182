from noaa_oracle_spark.functions.weather import (
    classify_precip,
    in_range,
    magnus_humidity,
    normalize_temp_unit,
    temp_to_unit,
    ts,
    utc_day,
)

__all__ = [
    "classify_precip",
    "in_range",
    "magnus_humidity",
    "normalize_temp_unit",
    "temp_to_unit",
    "ts",
    "utc_day",
]
