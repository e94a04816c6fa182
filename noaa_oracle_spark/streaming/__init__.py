from noaa_oracle_spark.streaming.snapshots import (
    stream_snapshots,
    streaming_daily_observations,
    streaming_latest_forecasts,
)

__all__ = [
    "stream_snapshots",
    "streaming_daily_observations",
    "streaming_latest_forecasts",
]
