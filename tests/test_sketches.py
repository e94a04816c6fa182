"""Approximate aggregates — the 100 TB substitutes for exact distinct
counts and percentiles. No cross-engine oracle exists (HLL++/KLL sketch
results are implementation-defined), so the gate suite carries the exact
forms (q33/q35); these tests pin the approximation ERROR against the exact
answer, which is the property a user of the sketch actually relies on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_approx_count_distinct_error(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey").alias("d")).first().d
    approx = (
        o.select(F.approx_count_distinct("o_custkey", rsd=0.02).alias("d"))
        .first()
        .d
    )
    assert abs(approx - exact) / exact < 0.05, (exact, approx)


def test_approx_percentile_error(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = li.select(
        F.expr("percentile(l_extendedprice, 0.9)").alias("p")
    ).first().p
    approx = li.select(
        F.percentile_approx("l_extendedprice", 0.9, 10_000).alias("p")
    ).first().p
    assert abs(approx - exact) / exact < 0.01, (exact, approx)
