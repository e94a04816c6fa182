from noaa_oracle_spark.incremental.rollup import DailyRollupStore

__all__ = ["DailyRollupStore"]
