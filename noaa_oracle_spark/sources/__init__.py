from noaa_oracle_spark.sources.catalog import SnapshotCatalog, snapshot_path
from noaa_oracle_spark.sources.reader import read_snapshots

__all__ = ["SnapshotCatalog", "snapshot_path", "read_snapshots"]
