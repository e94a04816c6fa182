"""Bucketed-table co-location: the join and the rollup on the bucket key
must run with ZERO shuffle exchanges — this is the layout that makes the
station-keyed join family (SURVEY §2.4) scale to years of snapshots.
"""

from __future__ import annotations

import pytest

from noaa_oracle_spark.sources.bucketed import colocated, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    df.collect()
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    write_bucketed(
        orders, "orders_bkt", str(base / "orders"),
        ["o_custkey"], num_buckets=8, sort_cols=["o_custkey"],
    )
    write_bucketed(
        customer, "customer_bkt", str(base / "customer"),
        ["c_custkey"], num_buckets=8, sort_cols=["c_custkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")


@pytest.fixture()
def no_broadcast(spark):
    """Force the non-broadcast join path so the test exercises what a
    100 TB fact-fact join would do (broadcast hides the shuffle)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_no_shuffle(spark, bucketed_tables, no_broadcast):
    o = colocated(spark, "orders_bkt")
    c = colocated(spark, "customer_bkt")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )
    p = _final_plan(j)
    assert "SortMergeJoin" in p
    assert "Exchange hashpartitioning" not in p, p
    assert "ShuffleQueryStage" not in p, p


def test_bucketed_agg_no_shuffle(spark, bucketed_tables):
    from pyspark.sql import functions as F

    o = colocated(spark, "orders_bkt")
    agg = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    p = _final_plan(agg)
    assert "Exchange hashpartitioning" not in p, p
    assert "ShuffleQueryStage" not in p, p


def test_unbucketed_join_shuffles(spark, no_broadcast):
    """Control: the same join off plain parquet DOES shuffle — proves the
    assertion above measures bucketing, not some session default."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    j = o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "c_name")
    p = _final_plan(j)
    assert "ShuffleQueryStage" in p or "Exchange hashpartitioning" in p, p
