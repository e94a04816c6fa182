"""Scalar weather expressions (SURVEY §2.9), as pure Column expressions.

Everything here stays JVM-side inside whole-stage codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# METAR wx_string precip-type classification regexes
# (weather_data.rs:514-530, :641-654; JS twin raw_data.js:550-562).
SNOW_RE = r"(^|\s)(SN|BLSN|DRSN)(\s|$)"
ICE_RE = r"(^|\s)(FZRA|FZDZ|PL|GR|GS|IC)(\s|$)"
# Any precip at all (rain fallback path requires some precip indicator).
RAIN_RE = r"(^|\s)(-|\+)?(RA|SHRA|TSRA|DZ|UP)(\s|$)"


def ts(col: str | Column) -> Column:
    """RFC3339 string → timestamp. Session TZ is UTC, so offset-bearing
    strings land on the correct instant (weather_data.rs:215 `::TIMESTAMPTZ`)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def utc_day(col: str | Column) -> Column:
    """`DATE_TRUNC('day', x AT TIME ZONE 'UTC')::TEXT`-equivalent day bucket
    (weather_data.rs:242, :362, :657). Returns 'YYYY-MM-DD' string."""
    return F.date_format(F.date_trunc("day", ts(col)), "yyyy-MM-dd")


def in_range(col: str | Column, lo: float, hi: float) -> Column:
    """Range-sanity predicate used inside conditional aggregates
    (weather_data.rs:365-373: temp ∈ [-200,200], wind ∈ [0,500],
    direction ∈ [0,360], humidity ∈ [0,100])."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (c >= F.lit(lo)) & (c <= F.lit(hi))


def agg_if(aggfn, col: Column, cond: Column) -> Column:
    """`agg(x) FILTER (WHERE cond)` — conditional aggregation in one pass
    (weather_data.rs:365-373). Spark: agg over a when() projection."""
    return aggfn(F.when(cond, col))


def magnus_humidity(avg_dew: Column, avg_temp: Column) -> Column:
    """Relative humidity from average dewpoint/temperature via the Magnus
    formula, rounded to BIGINT; NULL unless both averages are present
    (weather_data.rs:540-546, :663-668)."""
    gamma = lambda t: F.exp((F.lit(17.625) * t) / (F.lit(243.04) + t))  # noqa: E731
    return (
        F.when(
            avg_dew.isNotNull() & avg_temp.isNotNull(),
            F.round(F.lit(100.0) * gamma(avg_dew) / gamma(avg_temp), 0),
        )
    ).cast("long")


def classify_precip(wx: Column, temp_c: Column) -> Column:
    """METAR precip-type classification: snow codes → 'snow', ice codes →
    'ice', otherwise 'rain'; with the temperature heuristic fallback
    (temperature ≤ 2 °C counts as snow) when wx_string carries no code
    (weather_data.rs:514-530)."""
    wxs = F.coalesce(wx, F.lit(""))
    return (
        F.when(wxs.rlike(SNOW_RE), F.lit("snow"))
        .when(wxs.rlike(ICE_RE), F.lit("ice"))
        .when(
            (wxs == "") & temp_c.isNotNull() & (temp_c <= F.lit(2.0)),
            F.lit("snow"),
        )
        .otherwise(F.lit("rain"))
    )


def normalize_temp_unit(unit: Column) -> Column:
    """Lowercase + fix NOAA's 'celcius' spelling (weather_data.rs:54-60)."""
    lowered = F.lower(F.coalesce(unit, F.lit("")))
    return F.when(lowered == "celcius", F.lit("celsius")).otherwise(lowered)


def temp_to_unit(value: Column, from_unit: Column, to_unit: str) -> Column:
    """C↔F conversion done *inside the plan* (the reference converts after
    Arrow decode, weather_data.rs:1011-1037; in Spark it is a column
    expression so it stays in codegen)."""
    f = normalize_temp_unit(from_unit)
    if to_unit not in ("celsius", "fahrenheit"):
        raise ValueError(f"unknown temperature unit {to_unit!r}")
    if to_unit == "fahrenheit":
        return F.when(f == "celsius", value * 9.0 / 5.0 + 32.0).otherwise(value)
    return F.when(f == "fahrenheit", (value - 32.0) * 5.0 / 9.0).otherwise(value)
