from noaa_oracle_spark.queries.weather import (
    daily_observations,
    forecasts_data,
    observation_data,
    stations,
)

__all__ = [
    "daily_observations",
    "forecasts_data",
    "observation_data",
    "stations",
]
