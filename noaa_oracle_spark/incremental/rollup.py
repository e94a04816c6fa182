"""Incrementally-maintained daily observation rollup (continuous aggregate).

The reference recomputes every daily rollup from the raw snapshot files on
each request (weather_data.rs:579-704). Fine at 600 k rows; at 100 TB the
daily dashboard query cannot re-scan a year of snapshots. The lakehouse
answer is a continuous aggregate: keep a small parquet state of MERGEABLE
per-(station, day) partials, fold in only NEW snapshot files as they land,
and finalize at read time.

Decomposition — every aggregate of daily_observations is a commutative
monoid over partials, so incremental == recompute by algebra:

  final                         partial state               merge
  min(temp)                     min                         min
  max(temp), max(unit), ...     max                         max
  max(wind FILTER in-range)     conditional max             max
  sum(precip FILTER type)       conditional sum             sum
  magnus(avg(dew), avg(temp))   sum+count per column        sum, then
                                                            finalize avg

Sums/avgs keep SQL null semantics through the merge: F.sum/F.count skip
nulls, so a day whose every contribution was NULL stays NULL, exactly as a
one-shot aggregate. (Float sums may associate differently than a single
pass — the usual 1-ulp noise any distributed partial aggregation has.)

Writes follow the reference's single-writer model (sqlite.rs:24-72): one
refresh() at a time; state swaps are atomic so readers never see a
half-written state. The manifest (processed file list) rides INSIDE the
state directory and commits in the same rename as the state it describes
(incremental/statedir.py), so no crash point can produce a state whose
folded files the manifest has not recorded — the torn-commit window that
would double-fold sums on re-run.

Serving is day-granular: `serve(start_day, end_day, station_ids)` prunes on
the (tiny) state table. That is the continuous-aggregate contract —
sub-day windows go to the raw query path.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from noaa_oracle_spark.functions.weather import in_range, magnus_humidity, ts
from noaa_oracle_spark.incremental import statedir
from noaa_oracle_spark.queries.weather import _day_text, _with_precip_type
from noaa_oracle_spark.sources.catalog import SnapshotCatalog
from noaa_oracle_spark.sources.reader import read_snapshots

_KEYS = ["station_id", "date"]

def _partial_specs() -> list[tuple[str, object, str]]:
    """(state column, partial agg expr, merge kind). Built lazily — Column
    construction needs an active SparkContext."""
    t = F.col("temperature_value")
    w = F.col("wind_speed")
    d = F.col("wind_direction")
    p = F.col("precip_in")
    rain = p.isNotNull() & (p >= 0) & (F.col("precip_type") == "rain")
    snow = p.isNotNull() & (p >= 0) & (F.col("precip_type") == "snow")
    ice = p.isNotNull() & (p >= 0) & (F.col("precip_type") == "ice")
    return [
        ("min_temp", F.min(t), "min"),
        ("max_temp", F.max(t), "max"),
        ("max_wind", F.max(F.when(in_range(w, 0, 500), w)), "max"),
        ("max_unit", F.max("temperature_unit_code"), "max"),
        ("max_dir", F.max(F.when(in_range(d, 0, 360), d)), "max"),
        ("sum_dew", F.sum("dewpoint_value"), "sum"),
        ("cnt_dew", F.count("dewpoint_value"), "sum"),
        ("sum_temp", F.sum(t), "sum"),
        ("cnt_temp", F.count(t), "sum"),
        ("sum_rain", F.sum(F.when(rain, p)), "sum"),
        ("sum_snow", F.sum(F.when(snow, p * F.lit(10.0))), "sum"),
        ("sum_ice", F.sum(F.when(ice, p)), "sum"),
    ]


_MERGE_FN = {"min": F.min, "max": F.max, "sum": F.sum}


def _partials(obs: DataFrame) -> DataFrame:
    """Per-(station, day) partial aggregates for one batch of files."""
    df = _with_precip_type(obs).withColumn("date", _day_text(ts("generated_at")))
    return df.groupBy(*_KEYS).agg(
        *[expr.alias(name) for name, expr, _ in _partial_specs()]
    )


def _merge(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold delta partials into state partials (same schema)."""
    return (
        state.unionByName(delta)
        .groupBy(*_KEYS)
        .agg(
            *[
                _MERGE_FN[kind](name).alias(name)
                for name, _, kind in _partial_specs()
            ]
        )
    )


class DailyRollupStore:
    """Parquet-backed continuous aggregate of the daily observation rollup."""

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
        """Fold every not-yet-processed observation snapshot into the state.
        Returns the number of new files folded. Cost is O(new data) + one
        rewrite of the (tiny: stations × days) state table.

        Crash safety: the manifest rides inside the state directory and is
        published by the same atomic swap (incremental/statedir.py), so a
        torn run can never yield a state whose files the manifest has not
        recorded — the window that would double-fold sums on re-run."""
        statedir.recover(self._state_path)
        catalog = SnapshotCatalog(data_dir)
        all_paths = catalog.all_paths("observations")
        done = self.processed_paths()
        new = [p for p in all_paths if p not in done]
        if not new:
            return 0
        delta = _partials(read_snapshots(spark, new, "observations"))
        if os.path.exists(self._state_path):
            state = spark.read.parquet(self._state_path)
            merged = _merge(state, delta)
        else:
            merged = delta
        tmp = self._state_path + ".tmpdir"
        merged.write.mode("overwrite").parquet(tmp)
        statedir.publish(
            self._state_path, tmp, {"processed": sorted(done | set(new))}
        )
        return len(new)

    def serve(
        self,
        spark: SparkSession,
        station_ids: Sequence[str] | None = None,
        start_day: str | None = None,
        end_day: str | None = None,
    ) -> DataFrame:
        """Finalize partials to the daily_observations output shape.
        Day bounds are inclusive 'YYYY-MM-DD' strings (day-granular)."""
        statedir.recover(self._state_path)
        if not os.path.exists(self._state_path):
            raise FileNotFoundError("rollup state empty — call refresh() first")
        st = spark.read.parquet(self._state_path)
        if station_ids:
            st = st.filter(F.col("station_id").isin(list(station_ids)))
        if start_day is not None:
            st = st.filter(F.col("date") >= start_day)
        if end_day is not None:
            st = st.filter(F.col("date") <= end_day)
        avg_dew = F.when(
            F.col("cnt_dew") > 0, F.col("sum_dew") / F.col("cnt_dew")
        )
        avg_temp = F.when(
            F.col("cnt_temp") > 0, F.col("sum_temp") / F.col("cnt_temp")
        )
        return st.select(
            "station_id",
            "date",
            F.col("min_temp").alias("temp_low"),
            F.col("max_temp").alias("temp_high"),
            F.col("max_wind").alias("wind_speed"),
            F.col("max_unit").alias("temperature_unit_code"),
            F.col("max_dir").alias("wind_direction"),
            magnus_humidity(avg_dew, avg_temp).alias("humidity"),
            F.col("sum_rain").alias("rain_amt"),
            F.col("sum_snow").alias("snow_amt"),
            F.col("sum_ice").alias("ice_amt"),
        )
