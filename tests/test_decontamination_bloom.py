"""Bloom-prefiltered decontamination: output must equal the exact operator
for ANY bloom geometry (the filter only prunes the shuffle; the exact join
kills false positives), including pathologically small bitmaps where nearly
every gram is a false positive.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.text import (
    decontamination,
    decontamination_bloom,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return train, bench


def test_bloom_equals_exact(spark, split):
    train, bench = split
    exact = sorted(map(tuple, decontamination(train, bench, n=3).collect()))
    bloom = sorted(
        map(tuple, decontamination_bloom(train, bench, n=3).collect())
    )
    assert len(exact) > 0
    assert bloom == exact


def test_bloom_exact_under_heavy_false_positives(spark, split):
    """A 256-bit bitmap over thousands of grams saturates — nearly every
    corpus gram passes the filter — and the result must STILL be exact."""
    train, bench = split
    exact = sorted(map(tuple, decontamination(train, bench, n=3).collect()))
    tiny = sorted(
        map(
            tuple,
            decontamination_bloom(
                train, bench, n=3, m_bits=256, k_hashes=2
            ).collect(),
        )
    )
    assert tiny == exact


def test_bloom_empty_benchmark(spark, split):
    train, _ = split
    empty = train.limit(0)
    assert decontamination_bloom(train, empty, n=3).count() == 0


def test_bloom_prunes_shuffle_side(spark, split):
    """The point of the tier: with a sane bitmap, the candidate stream
    entering the shuffle join is a small fraction of the corpus gram
    stream. Measured structurally: non-matching grams must be droppable
    map-side, i.e. the bloom-test filter appears below the join."""
    train, bench = split
    plan = decontamination_bloom(train, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    # the bitmap rides in via a broadcast join, and the bloom membership
    # test is a Filter above it (below the shuffle join with bench grams)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
