from noaa_oracle_spark.eventstore.store import EventStore, get_status

__all__ = ["EventStore", "get_status"]
