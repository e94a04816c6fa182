"""r12 optimization-round internals: the fast paths must be value-identical
to the shapes they replaced.

Three changes are covered:
  1. householder_rotate's Arrow/numpy kernel vs the higher-order-function
     column-expression form it replaced — BIT equality (the q109 oracle
     rounds at 6 dp, but the kernel was designed order-identical, so the
     raw doubles must match exactly, not approximately).
  2. codebook frames carrying their rows driver-local
     (`_local_codebook_rows`) — the no-job path and the collect fallback
     must produce the same books dict.
  3. global_rank exposing its pass-1 total (`_global_rank_total`) — must
     equal the true row count exactly (perplexity_buckets cuts buckets
     with it).
"""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F


def _expression_rotate(corpus, v, id_col="vec_id", vec_col="embedding"):
    """The pre-r12 householder_rotate body (higher-order column
    expressions, sequential-order dot products) — kept here verbatim as
    the equality reference for the numpy kernel."""
    vl = F.array(*[F.lit(float(x)) for x in v])
    xd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(vl, xd, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vv = F.aggregate(
        F.transform(vl, lambda a: a * a),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scale = F.lit(2.0) * dot / vv
    rotated = F.zip_with(xd, vl, lambda x, vi: x - scale * vi)
    return corpus.select(F.col(id_col), rotated.alias(vec_col))


def test_householder_kernel_bitwise_matches_expression_form(spark):
    from noaa_oracle_spark.pipeline.pq import householder_rotate

    rnd = random.Random(12)
    rows = [
        (i, [rnd.gauss(0, 3) for _ in range(64)]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = [rnd.gauss(0, 1) for _ in range(64)]

    got = {
        r.vec_id: r.embedding for r in householder_rotate(df, v).collect()
    }
    want = {
        r.vec_id: r.embedding for r in _expression_rotate(df, v).collect()
    }
    assert set(got) == set(want)
    for i in got:
        # bit equality, not allclose: the kernel sums dims left-to-right
        # exactly like the sequential aggregate() it replaced
        assert got[i] == want[i], i


def test_codebook_local_rows_path_matches_collect(spark):
    from noaa_oracle_spark.pipeline.pq import (
        _books_dict,
        _books_from_rows,
        pq_train,
    )

    rnd = random.Random(3)
    rows = [
        (i, [rnd.gauss(0, 1) for _ in range(32)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(df, m=4, k=8, iters=1)

    assert getattr(books, "_local_codebook_rows", None) is not None
    fast = _books_dict(books)
    slow = _books_from_rows(books.collect())
    assert fast.keys() == slow.keys()
    for s in fast:
        np.testing.assert_array_equal(fast[s], slow[s])

    # a TRANSFORMED frame loses the attribute and must fall back to the
    # collect path without error (and stay value-identical)
    reordered = books.orderBy(F.desc("sub"), "code")
    assert getattr(reordered, "_local_codebook_rows", None) is None
    fallback = _books_dict(reordered)
    for s in fast:
        np.testing.assert_array_equal(fallback[s], fast[s])


def test_spread_is_scale_adaptive(spark):
    """spread() repartitions narrow inputs (the local single-file case)
    but is a no-op when the input already has >= defaultParallelism
    partitions — the 100 TB case, where the old unconditional
    repartition was a full-corpus exchange. Operator results must be
    identical either way."""
    from noaa_oracle_spark.pipeline.dedup import ngram_jaccard_pairs, spread

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1).selectExpr(
        "id AS doc_id",
        "concat('tok', cast(id % 7 AS string), ' a b c d e f g h i j k l m n"
        " o p q r s t') AS text",
    )
    assert spread(narrow).rdd.getNumPartitions() == par

    wide = narrow.repartition(par + 3)
    assert spread(wide) is wide  # no new plan node at all

    got_n = sorted(tuple(r) for r in ngram_jaccard_pairs(narrow).collect())
    got_w = sorted(tuple(r) for r in ngram_jaccard_pairs(wide).collect())
    assert got_n == got_w and len(got_n) > 0


def test_global_rank_total_attr_is_exact(spark):
    from noaa_oracle_spark.pipeline.profile import global_rank

    rows = [(i, (i * 37) % 101) for i in range(997)]
    df = spark.createDataFrame(rows, "id long, score long")
    ranked = global_rank(
        df, order=[(F.col("score"), "asc"), (F.col("id"), "asc")],
        n_parts=8, rank_col="_rank",
    )
    assert ranked._global_rank_total == 997
    # and the rank itself is consistent with that total
    assert ranked.agg(F.max("_rank")).collect()[0][0] == 997


def test_spark_read_component_matches_inference(spark, tmp_path):
    """metaio.spark_read_component must return the SAME schema (and rows)
    as plain schema-inference spark.read.parquet, with ZERO Spark jobs
    spent on schema discovery — flat layout, dir-partitioned layout
    (IntegerType partition column, matching Spark's inference), and the
    fallback for a partition value that does not parse as int32."""
    from noaa_oracle_spark.pipeline.metaio import spark_read_component

    st = spark.sparkContext.statusTracker()

    def njobs():
        return len(st.getJobIdsForGroup(None))

    flat = str(tmp_path / "flat")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("dl"),
        F.concat(F.lit("t"), F.col("id")).alias("term"),
        F.array(F.col("id").cast("double")).alias("vec"),
    )
    df.repartition(3).write.parquet(flat)
    inf = spark.read.parquet(flat)
    j0 = njobs()
    fast = spark_read_component(spark, flat)
    assert njobs() - j0 == 0, "schema read must not launch a job"
    assert fast.schema == inf.schema
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, inf.collect())
    )

    part = str(tmp_path / "part")
    df.withColumn("cluster_id", (F.col("doc_id") % 4).cast("int")).write.partitionBy(
        "cluster_id"
    ).parquet(part)
    inf_p = spark.read.parquet(part)
    j0 = njobs()
    fast_p = spark_read_component(spark, part, partitioned_by="cluster_id")
    assert njobs() - j0 == 0
    assert fast_p.schema == inf_p.schema
    assert sorted(map(tuple, fast_p.collect())) == sorted(
        map(tuple, inf_p.collect())
    )

    # non-integer partition value -> falls back to inference (identical
    # behavior, schema still correct)
    weird = str(tmp_path / "weird")
    df.withColumn("cluster_id", F.lit("x7")).write.partitionBy(
        "cluster_id"
    ).parquet(weird)
    fb = spark_read_component(spark, weird, partitioned_by="cluster_id")
    assert fb.schema == spark.read.parquet(weird).schema

    # missing directory -> same error class as plain read
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        spark_read_component(spark, str(tmp_path / "nope")).collect()
