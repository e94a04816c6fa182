from noaa_oracle_spark.sources.bucketed import colocated, write_bucketed
from noaa_oracle_spark.sources.catalog import SnapshotCatalog, snapshot_path
from noaa_oracle_spark.sources.reader import read_snapshots

__all__ = [
    "SnapshotCatalog",
    "colocated",
    "read_snapshots",
    "snapshot_path",
    "write_bucketed",
]
