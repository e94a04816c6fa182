"""salted_join: row-identical to the plain join, for every join type the
salt composes with, on the repo's genuinely skewed table (events: 15 users,
1000+ rows — the per-user hot-key shape salting exists for).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.operators.skew import salted_join

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain(spark, how):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    dim = spark.range(12).select(
        F.col("id").alias("user_id"),
        (F.col("id") * 10).alias("tier"),
    )
    plain = e.join(dim, ["user_id"], how)
    salted = salted_join(e, dim, ["user_id"], num_salts=8, how=how)
    key = lambda r: (r.user_id, r.event_id, r.value, r.tier)
    assert sorted(map(key, plain.collect())) == sorted(
        map(key, salted.collect())
    )


def test_salt_spreads_hot_key(spark):
    """All rows share ONE key — the salt must still spread them across
    multiple shuffle partitions (the whole point)."""
    hot = spark.range(1000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(1, "x")], "k long, label string")
    out = salted_join(hot, dim, ["k"], num_salts=8)
    assert out.count() == 1000
    n_salts = (
        hot.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8)),
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts == 8


def test_reserved_column_guards(spark):
    """Internal helper columns colliding with user columns must raise, not
    silently corrupt the join."""
    import pytest as _pytest

    from noaa_oracle_spark.operators.asof import asof_join
    from noaa_oracle_spark.operators.rangejoin import binned_range_join

    df_salt = spark.createDataFrame([(1, 2)], "k long, _salt long")
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(df_salt, df_salt, ["k"])

    df_bin = spark.createDataFrame([(1, 2)], "a_us long, _bin long")
    with _pytest.raises(ValueError, match="_bin"):
        binned_range_join(df_bin, df_bin.select("a_us"), "a_us", "a_us", 10)

    df_asof = spark.createDataFrame([(1, 2)], "k long, _asof_ts long")
    with _pytest.raises(ValueError, match="_asof"):
        asof_join(df_asof, df_asof, ["k"], "_asof_ts", "_asof_ts", ["k"])
