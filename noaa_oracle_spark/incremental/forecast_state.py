"""Incrementally-maintained latest-forecast state (the flagship query's
continuous-aggregate path).

`forecasts_data` (queries/weather.py; weather_data.rs:90-424) starts with a
latest-`generated_at`-wins dedup per (station, window). On raw snapshots
that dedup re-scans every file the time predicates select — the dominant
cost, and the one that grows with history (the reference pays it inside
DuckDB on every request). But "latest row per key" is a mergeable argmax:
folding snapshot files one at a time into a kept-rows state yields exactly
the same winners as deduping all files at once (the ordering
(ts(generated_at), generated_at-string) is total, so argmax is associative
and commutative).

So the store keeps ONE canonical-schema row per (station_id, begin instant,
end instant) — the freshest forecast for that window — and `refresh()`
folds only new files: cost O(new data + state size), not O(history). At the
reference's cadence the state is bounded by stations × forecast horizon
(~2,500 × ~56 windows), thousands of rows regardless of how many years of
snapshots exist.

`serve()` runs the full `forecasts_data` pipeline on the state instead of
the raw files. Contract: the state holds only the LATEST generation per
window, so serve answers "current best forecast" queries — the
`generated_at` freshness filters are forced wide open (historical
generated-window queries must use the raw recompute path; the state has
deliberately forgotten superseded generations).

Same single-writer model as DailyRollupStore: one refresh() at a time;
state and manifest commit together in one atomic swap
(incremental/statedir.py).
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_oracle_spark.functions.weather import ts
from noaa_oracle_spark.incremental import statedir
from noaa_oracle_spark.operators.dedup import distinct_on
from noaa_oracle_spark.queries.weather import forecasts_data
from noaa_oracle_spark.sources.catalog import SnapshotCatalog
from noaa_oracle_spark.sources.reader import read_snapshots

_WIDE_START = datetime(1970, 1, 1, tzinfo=timezone.utc)
_WIDE_END = datetime(9999, 1, 1, tzinfo=timezone.utc)


def _fold_latest(df: DataFrame) -> DataFrame:
    """Keep the freshest row per (station, UTC begin/end instant) — the
    same key and total order as forecasts_data's dedup stage."""
    return distinct_on(
        df.withColumn("__b", ts("begin_time")).withColumn("__e", ts("end_time")),
        keys=["station_id", "__b", "__e"],
        order_by=[F.desc(ts("generated_at")), F.desc("generated_at")],
    ).drop("__b", "__e")


class LatestForecastStore:
    """Parquet-backed latest-wins forecast state, folded per snapshot file."""

    def __init__(self, store_dir: str):
        self.store_dir = store_dir
        os.makedirs(store_dir, exist_ok=True)

    @property
    def _state_path(self) -> str:
        return os.path.join(self.store_dir, "state.parquet")

    def processed_paths(self) -> set[str]:
        meta = statedir.read_meta(self._state_path)
        return set(meta["processed"]) if meta else set()

    def refresh(self, spark: SparkSession, data_dir: str) -> int:
        """Fold every not-yet-processed forecast snapshot into the state.
        Returns the number of new files folded. Manifest commits inside
        the state swap (statedir.publish) — and although an argmax refold
        would be harmless (unlike the rollup's sums), the torn-commit
        window is closed here too for uniformity."""
        statedir.recover(self._state_path)
        catalog = SnapshotCatalog(data_dir)
        all_paths = catalog.all_paths("forecasts")
        done = self.processed_paths()
        new = [p for p in all_paths if p not in done]
        if not new:
            return 0
        delta = read_snapshots(spark, new, "forecasts")
        if os.path.exists(self._state_path):
            base = spark.read.parquet(self._state_path)
            folded = _fold_latest(base.unionByName(delta))
        else:
            folded = _fold_latest(delta)
        tmp = self._state_path + ".tmpdir"
        folded.write.mode("overwrite").parquet(tmp)
        statedir.publish(
            self._state_path, tmp, {"processed": sorted(done | set(new))}
        )
        return len(new)

    def serve(
        self,
        spark: SparkSession,
        station_ids: Sequence[str] | None = None,
        start: datetime | None = None,
        end: datetime | None = None,
        temperature_unit: str | None = None,
    ) -> DataFrame:
        """forecasts_data over the state — identical output to the raw
        recompute with a wide-open generated window, at O(state) cost."""
        statedir.recover(self._state_path)
        if not os.path.exists(self._state_path):
            raise FileNotFoundError(
                "forecast state empty — call refresh() first"
            )
        return forecasts_data(
            spark.read.parquet(self._state_path),
            station_ids=station_ids,
            start=start,
            end=end,
            generated_start=_WIDE_START,
            generated_end=_WIDE_END,
            temperature_unit=temperature_unit,
        )
