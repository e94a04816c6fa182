from noaa_oracle_spark.incremental.forecast_state import LatestForecastStore
from noaa_oracle_spark.incremental.rollup import DailyRollupStore

__all__ = ["DailyRollupStore", "LatestForecastStore"]
