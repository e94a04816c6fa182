"""Legacy DuckDB nested event-store mirror (STRUCT/LIST surface).

The reference carries a second, DuckDB-backed event store whose schema
uses nested types (crates/oracle/src/db/event_db_migrations.rs:36-115):
`weather.observed` / `weather.forecasted` are
STRUCT(reading_date, temp_low, temp_high, wind_speed), `events.locations`
and `events.scoring_fields` are TEXT[], and `events_weather` is the
junction between them. The reference's own startup wires SQLite instead
(startup.rs:109-113), so this is parity for the *data model*, not a live
code path — but a user migrating stored `events.db3` data gets the same
nested shapes and accessors here.

Spark-first mapping: DuckDB STRUCT == Spark StructType column, TEXT[] ==
array<string>, ROW(...) construction == F.struct, struct field access ==
the same dotted path both engines use. The mod.rs:1113-1307 accessors —
ordered struct-field extraction and the 0..=3000 wind-speed validity
window (mod.rs:1197-1201) — become Column expressions; rebuilding an
event's weather LIST is a junction join + sort-keyed collect_list.

Everything reads/writes plain parquet (nested Parquet groups), so the
single-writer table layer in store.py applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

READING_STRUCT = T.StructType(
    [
        T.StructField("reading_date", T.TimestampType(), True),
        T.StructField("temp_low", T.IntegerType(), True),
        T.StructField("temp_high", T.IntegerType(), True),
        T.StructField("wind_speed", T.IntegerType(), True),
    ]
)

LEGACY_WEATHER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("station_id", T.StringType(), False),
        T.StructField("observed", READING_STRUCT, True),
        T.StructField("forecasted", READING_STRUCT, True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

LEGACY_EVENTS_WEATHER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("event_id", T.StringType(), False),
        T.StructField("weather_id", T.StringType(), False),
    ]
)

#: events.locations / events.scoring_fields — the TEXT[] columns of the
#: legacy events table (event_db_migrations.rs:62, :66)
LEGACY_EVENT_ARRAYS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("locations", T.ArrayType(T.StringType()), True),
        T.StructField("scoring_fields", T.ArrayType(T.StringType()), True),
    ]
)


def reading_struct(
    date: Column, temp_low: Column, temp_high: Column, wind_speed: Column
) -> Column:
    """ROW('date', low, high, wind) — the ToRawSql construction
    (mod.rs:1113-1131) as F.struct; field ORDER is the contract (the
    reference extracts by position, mod.rs:1140-1190)."""
    return F.struct(
        date.alias("reading_date"),
        temp_low.cast("int").alias("temp_low"),
        temp_high.cast("int").alias("temp_high"),
        wind_speed.cast("int").alias("wind_speed"),
    )


def valid_wind_speed(ws: Column) -> Column:
    """The 0..=3000 validity window (mod.rs:1197-1201): out-of-range
    readings become NULL, not errors."""
    return F.when((ws >= 0) & (ws <= 3000), ws)


def extract_reading(
    weather: DataFrame, which: str = "forecasted"
) -> DataFrame:
    """Flatten one nested reading column with the reference's accessor
    semantics: positional struct fields out, wind-speed validity applied
    (the TryInto<Forecasted> path, mod.rs:1140-1209)."""
    if which not in ("observed", "forecasted"):
        raise ValueError(f"unknown reading column {which!r}")
    s = F.col(which)
    return weather.select(
        "id",
        "station_id",
        s["reading_date"].alias("reading_date"),
        s["temp_low"].cast("long").alias("temp_low"),
        s["temp_high"].cast("long").alias("temp_high"),
        valid_wind_speed(s["wind_speed"].cast("long")).alias("wind_speed"),
    )


def event_weather_lists(
    events_weather: DataFrame, weather: DataFrame
) -> DataFrame:
    """Rebuild each event's weather LIST through the junction table —
    the get_event read path that hydrates Vec<Weather> per event
    (mod.rs get_event/get_events). Deterministic: the list is sorted by
    weather id (array_sort over (id, payload) structs keyed on id), so
    the same store contents produce the same nested rows on any engine
    or partitioning."""
    joined = events_weather.join(
        weather.select(
            F.col("id").alias("weather_id"),
            F.struct("id", "station_id", "observed", "forecasted").alias(
                "w"
            ),
        ),
        "weather_id",
    )
    return joined.groupBy("event_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("weather_id"), F.col("w")))),
            lambda s: s["w"],
        ).alias("weather"),
        F.count(F.lit(1)).cast("long").alias("n_weather"),
    )


def stations_in_any_event_location(
    weather: DataFrame, events: DataFrame
) -> DataFrame:
    """TEXT[] membership: weather rows whose station appears in an
    event's `locations` array — the legacy filter shape for scoping a
    contest's readings (array_contains on the LIST column). Emits
    (event_id, station_id) pairs, distinct."""
    ev = events.select(
        F.col("id").alias("event_id"), F.explode("locations").alias("loc")
    )
    return (
        weather.select("station_id")
        .distinct()
        .join(ev, F.col("station_id") == F.col("loc"))
        .select("event_id", "station_id")
        .distinct()
    )
