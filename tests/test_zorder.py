"""Z-order layout: multi-dimensional file-skipping actually materializes.

The assertion is made against parquet file-level min/max statistics (what
row-group/file skipping reads): for a box query on BOTH z-columns, the
number of files whose stats intersect the box must be far below (a) the
file count and (b) what a 1-D linear sort layout achieves on its non-sort
column. This is the property that turns a 100 TB scan into a bounded one
when queries co-filter (user, value)-style pairs.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.sources.zorder import write_zordered, zorder_value

N_FILES = 16


def _candidate_files(path: str, box: dict[str, tuple[float, float]]) -> int:
    """Count files whose min/max stats intersect the query box on every
    boxed column — exactly the files a stats-based reader must open."""
    n = 0
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in box and col.statistics is not None:
                    mins[name] = min(mins.get(name, float("inf")),
                                     col.statistics.min)
                    maxs[name] = max(maxs.get(name, float("-inf")),
                                     col.statistics.max)
        if all(
            mins.get(c, float("-inf")) <= hi and maxs.get(c, float("inf")) >= lo
            for c, (lo, hi) in box.items()
        ):
            n += 1
    return n


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("zorder")
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zpath, lpath = str(d / "zorder"), str(d / "linear")
    write_zordered(ev, zpath, ["user_id", "value"], N_FILES, bits=8)
    # 1-D control: same file count, linearly sorted by user_id only
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    return ev, zpath, lpath


def test_zorder_preserves_rows(spark, layouts):
    ev, zpath, _ = layouts
    got = spark.read.parquet(zpath)
    assert got.count() == ev.count()
    assert (
        got.agg(F.sum("event_id")).first()[0]
        == ev.agg(F.sum("event_id")).first()[0]
    )


def test_zorder_prunes_both_dimensions(spark, layouts):
    ev, zpath, lpath = layouts
    u_lo, u_hi = 100, 140        # ~4% of user_ids (1..~1000)
    v_lo, v_hi = 100.0, 140.0    # ~4% of value range
    box = {"user_id": (u_lo, u_hi), "value": (v_lo, v_hi)}
    z_files = _candidate_files(zpath, box)
    l_files = _candidate_files(lpath, box)
    # Linear layout prunes on user_id but every file spans all values →
    # candidates on the box ≈ files matching user range alone. Z-order
    # must beat it and touch a small minority of files.
    assert z_files < l_files, (z_files, l_files)
    assert z_files <= N_FILES // 4, (z_files, l_files)

    # The decisive case: a filter on the NON-sort dimension alone. The
    # linear layout cannot skip anything (every file spans all values);
    # z-order still bounds the read set.
    vbox = {"value": (v_lo, v_hi)}
    assert _candidate_files(lpath, vbox) == N_FILES
    assert _candidate_files(zpath, vbox) <= N_FILES // 2

    # correctness: pruned reads return the same rows
    got = (
        spark.read.parquet(zpath)
        .filter(F.col("user_id").between(u_lo, u_hi)
                & F.col("value").between(v_lo, v_hi))
        .count()
    )
    want = ev.filter(
        F.col("user_id").between(u_lo, u_hi)
        & F.col("value").between(v_lo, v_hi)
    ).count()
    assert got == want


def test_zvalue_expression_is_codegen(spark):
    """The Morton interleave must stay a JVM expression (no Python UDF /
    BatchEvalPython in the plan)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    z = zorder_value(ev, ["user_id", "value"], bits=4)
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "PythonUDF" not in plan
