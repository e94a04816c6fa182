"""round_half_up: the numpy-kernel rounding that matches Spark/DuckDB
ROUND semantics (HALF_UP on exact decimal half-way doubles), where
np.round's HALF_EVEN diverges — reachable ties exist for the quantized
vector tiers (dequantized values are dyadic rationals)."""

from __future__ import annotations

import numpy as np
import pytest

from noaa_oracle_spark.pipeline.rounding import round_half_up


def test_ties_round_away_from_zero():
    # odd multiples of 2^-7 sit EXACTLY on the 6-dp half-way point;
    # 0.1234565's binary value is just BELOW the half, but the engines
    # round its shortest repr — so it goes up too
    ties = np.array([0.0078125, -0.0078125, 0.0390625, 0.5078125,
                     0.1234565])
    got = round_half_up(ties, 6)
    want = np.array([0.007813, -0.007813, 0.039063, 0.507813, 0.123457])
    assert np.array_equal(got, want)
    # np.round demonstrates the divergence this helper exists to close
    assert not np.array_equal(np.round(ties, 6), want)


def test_non_ties_match_np_round():
    rng = np.random.RandomState(0)
    x = rng.randn(1000) * 3
    assert np.array_equal(round_half_up(x, 6), np.round(x, 6))


def test_matches_engines(spark):
    """The helper agrees with BOTH engines on tie and non-tie values."""
    import duckdb

    from pyspark.sql import functions as F

    vals = [0.0078125, -0.0234375, 0.1234565, 1.5, -2.5e-6, 0.333333333]
    ours = list(round_half_up(np.array(vals), 6))
    spark_r = [
        r.r
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 6).alias("r"))
        .collect()
    ]
    duck_r = [
        duckdb.sql(f"SELECT round({v!r}::DOUBLE, 6)").fetchone()[0]
        for v in vals
    ]
    assert ours == spark_r == duck_r


def test_shapes_and_scalars():
    m = np.array([[0.0078125, 0.25], [0.1, -0.0078125]])
    got = round_half_up(m, 6)
    assert got.shape == (2, 2)
    assert got[0, 0] == 0.007813 and got[1, 1] == -0.007813
