"""PQ index persistence: save → load → search equals in-memory search;
geometry validation fails loudly on manifest/codebook mismatch."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.pq import (
    ivfpq_knn,
    load_pq_index,
    pq_encode,
    pq_knn,
    pq_train,
    save_pq_index,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(300, 16).astype(np.float32)
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )


def test_pq_index_roundtrip_search(spark, emb, tmp_path):
    books = pq_train(emb, m=4, k=8, iters=1)
    enc = pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < 5)
    fresh = sorted(map(tuple, pq_knn(q, enc, books, k=3).collect()))

    path = str(tmp_path / "idx")
    save_pq_index(books, enc, path)
    idx = load_pq_index(spark, path)
    assert idx["cells"] is None
    loaded = sorted(
        map(
            tuple,
            pq_knn(q, idx["codes"], idx["codebooks"], k=3).collect(),
        )
    )
    assert loaded == fresh
    assert idx["manifest"].dim == 16 and idx["manifest"].m == 4


def test_ivfpq_index_roundtrip_search(spark, emb, tmp_path):
    books = pq_train(emb, m=4, k=8, iters=1)
    cells = emb.filter(F.col("vec_id") < 8)
    q = emb.filter(F.col("vec_id") < 3)
    fresh = sorted(
        map(
            tuple,
            ivfpq_knn(q, emb, books, cells, k=3, nprobe=4).collect(),
        )
    )
    path = str(tmp_path / "ividx")
    save_pq_index(books, pq_encode(emb, books), path, cells=cells)
    idx = load_pq_index(spark, path)
    loaded = sorted(
        map(
            tuple,
            ivfpq_knn(
                q, emb, idx["codebooks"], idx["cells"], k=3, nprobe=4
            ).collect(),
        )
    )
    assert loaded == fresh


def test_pq_index_custom_id_col_round_trip(spark, emb, tmp_path):
    """r9 advice: an index saved with id_col != 'vec_id' must load and
    serve — load_pq_index derives the id column from the codes schema
    instead of hardcoding vec_id."""
    from noaa_oracle_spark.pipeline.pq import ivfpq_query, save_ivfpq_index

    from noaa_oracle_spark.pipeline.pq import ivfpq_query_batch

    renamed = (
        emb.withColumnRenamed("vec_id", "doc_id")
        .withColumnRenamed("embedding", "vec")
    )
    books = pq_train(renamed, m=4, k=8, iters=1, id_col="doc_id",
                     vec_col="vec")
    cells = renamed.filter(F.col("doc_id") < 8)
    path = str(tmp_path / "named_idx")
    save_ivfpq_index(
        books, renamed, cells, path, id_col="doc_id", vec_col="vec"
    )

    idx = load_pq_index(spark, path)  # raised on F.min('vec_id') before
    assert idx["min_vec_id"] == 0
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()[1]]
    # single and batch serve both derive (id, centroid) columns from the
    # schemas instead of hardcoding vec_id/embedding
    got = ivfpq_query(idx, qvec, k=3, nprobe=8).collect()
    assert len(got) == 3 and got[0].n_id == 0  # self is its own 1-NN
    batch = ivfpq_query_batch(idx, [qvec], k=3, nprobe=8).collect()
    assert sorted((r.rank, r.n_id, r.adc_dist) for r in batch) == sorted(
        (r.rank, r.n_id, r.adc_dist) for r in got
    )


def test_pq_index_geometry_validation(spark, emb, tmp_path):
    books = pq_train(emb, m=4, k=8, iters=1)
    enc = pq_encode(emb, books)
    path = str(tmp_path / "bad")
    save_pq_index(books, enc, path)
    # corrupt: overwrite the codebooks with a different geometry
    pq_train(emb, m=2, k=8, iters=1).write.mode("overwrite").parquet(
        f"{path}/codebooks"
    )
    with pytest.raises(ValueError, match="geometry"):
        load_pq_index(spark, path)


def test_pq_index_interrupted_resave_fails_loudly(spark, emb, tmp_path):
    """A re-save that dies after writing SAME-geometry retrained
    codebooks but before the manifest leaves old-manifest + new-books:
    the content fingerprint catches it (geometry alone would not)."""
    books = pq_train(emb, m=4, k=8, iters=1)
    enc = pq_encode(emb, books)
    path = str(tmp_path / "resave")
    save_pq_index(books, enc, path)
    retrained = pq_train(emb, m=4, k=8, iters=2)  # same geometry
    retrained.write.mode("overwrite").parquet(f"{path}/codebooks")
    with pytest.raises(ValueError, match="fingerprint"):
        load_pq_index(spark, path)


def test_pq_index_codes_count_validation(spark, emb, tmp_path):
    books = pq_train(emb, m=4, k=8, iters=1)
    enc = pq_encode(emb, books)
    path = str(tmp_path / "cnt")
    save_pq_index(books, enc, path)
    enc.limit(10).write.mode("overwrite").parquet(f"{path}/codes")
    with pytest.raises(ValueError, match="inconsistent index"):
        load_pq_index(spark, path)


def test_append_pq_index_equals_full_encode(spark, emb, tmp_path):
    """Index over the first 200 vectors + append of the last 100 must
    search identically to an index encoded over all 300 with the same
    codebooks (encode is deterministic per row — frozen books)."""
    from noaa_oracle_spark.pipeline.pq import append_pq_index

    books = pq_train(emb.filter(F.col("vec_id") < 200), m=4, k=8, iters=1)
    base = emb.filter(F.col("vec_id") < 200)
    extra = emb.filter(F.col("vec_id") >= 200)
    path = str(tmp_path / "grow")
    save_pq_index(books, pq_encode(base, books), path)

    n_added = append_pq_index(spark, path, extra)
    assert n_added == 100

    idx = load_pq_index(spark, path)
    assert idx["manifest"].n_encoded == 300
    q = emb.filter(F.col("vec_id") < 5)
    grown = sorted(
        map(tuple, pq_knn(q, idx["codes"], idx["codebooks"], k=3).collect())
    )
    full = sorted(
        map(tuple, pq_knn(q, pq_encode(emb, books), books, k=3).collect())
    )
    assert grown == full


def test_append_pq_index_rejects_overlap_and_dim(spark, emb, tmp_path):
    from noaa_oracle_spark.pipeline.pq import append_pq_index

    books = pq_train(emb, m=4, k=8, iters=1)
    path = str(tmp_path / "dup")
    save_pq_index(books, pq_encode(emb, books), path)
    with pytest.raises(ValueError, match="disjoint"):
        append_pq_index(spark, path, emb.filter(F.col("vec_id") < 10))
    wrong_dim = emb.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.slice(F.col("embedding"), 1, 8).alias("embedding"),
    )
    with pytest.raises(ValueError, match="dim"):
        append_pq_index(spark, path, wrong_dim)
    bad_id = emb.select(
        (F.col("vec_id") + 1000).alias("other_id"), "embedding"
    )
    with pytest.raises(ValueError, match="id column"):
        append_pq_index(spark, path, bad_id)


def test_append_pq_index_torn_append_fails_loudly(spark, emb, tmp_path):
    """Codes appended but manifest not rewritten (the crash window) →
    load_pq_index must reject the directory, not serve a half-index."""
    books = pq_train(emb, m=4, k=8, iters=1)
    base = emb.filter(F.col("vec_id") < 200)
    path = str(tmp_path / "torn")
    save_pq_index(books, pq_encode(base, books), path)
    # simulate the torn append: new codes land, manifest write dies
    pq_encode(
        emb.filter(F.col("vec_id") >= 200), books
    ).write.mode("append").parquet(f"{path}/codes")
    with pytest.raises(ValueError, match="inconsistent index"):
        load_pq_index(spark, path)


def test_merge_pq_indexes_equals_single_index(spark, emb, tmp_path):
    """Three shard indexes encoded independently with the SAME codebooks
    merge into an index that searches identically to one built over the
    whole corpus; different-codebook or IVF shards refuse."""
    from noaa_oracle_spark.pipeline.pq import merge_pq_indexes

    books = pq_train(emb, m=4, k=8, iters=1)
    shards = [
        emb.filter(F.col("vec_id") % 3 == r) for r in range(3)
    ]
    paths = [str(tmp_path / f"shard{r}") for r in range(3)]
    for df, p in zip(shards, paths):
        save_pq_index(books, pq_encode(df, books), p)

    merged = str(tmp_path / "merged")
    merge_pq_indexes(spark, paths, merged)
    idx = load_pq_index(spark, merged)
    assert idx["manifest"].n_encoded == 300 and idx["cells"] is None

    q = emb.filter(F.col("vec_id") < 5)
    got = sorted(
        map(tuple, pq_knn(q, idx["codes"], idx["codebooks"], k=3).collect())
    )
    want = sorted(
        map(tuple, pq_knn(q, pq_encode(emb, books), books, k=3).collect())
    )
    assert got == want


def test_merge_pq_indexes_validation(spark, emb, tmp_path):
    from noaa_oracle_spark.pipeline.pq import merge_pq_indexes

    books = pq_train(emb, m=4, k=8, iters=1)
    a = str(tmp_path / "a")
    save_pq_index(books, pq_encode(emb.filter(F.col("vec_id") < 100), books), a)

    with pytest.raises(ValueError, match="at least two"):
        merge_pq_indexes(spark, [a], str(tmp_path / "out0"))

    # overlapping ids refuse
    b = str(tmp_path / "b")
    save_pq_index(
        books, pq_encode(emb.filter(F.col("vec_id") < 50), books), b
    )
    with pytest.raises(ValueError, match="overlap"):
        merge_pq_indexes(spark, [a, b], str(tmp_path / "out1"))

    # different codebooks refuse
    books2 = pq_train(emb, m=4, k=8, iters=2)
    c = str(tmp_path / "c")
    save_pq_index(
        books2, pq_encode(emb.filter(F.col("vec_id") >= 100), books2), c
    )
    with pytest.raises(ValueError, match="same-codebook"):
        merge_pq_indexes(spark, [a, c], str(tmp_path / "out2"))

    # IVF shards refuse
    d = str(tmp_path / "d")
    save_pq_index(
        books,
        pq_encode(emb.filter(F.col("vec_id") >= 100), books),
        d,
        cells=emb.filter(F.col("vec_id") < 8),
    )
    with pytest.raises(ValueError, match="IVF"):
        merge_pq_indexes(spark, [a, d], str(tmp_path / "out3"))


def test_ivfpq_query_serves_partition_pruned_and_matches_batch(
    spark, emb, tmp_path
):
    """save_ivfpq_index → load → ivfpq_query must (a) answer exactly
    like the batch ivfpq_knn for the same vector/cells/nprobe, and
    (b) carry the cluster_id partition filter INTO the scan — pruning
    happens at file-listing time, the serve-side 100 TB contract."""
    from noaa_oracle_spark.pipeline.pq import ivfpq_query, save_ivfpq_index

    books = pq_train(emb, m=4, k=8, iters=1)
    cells = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "ivserve")
    save_ivfpq_index(books, emb, cells, path)
    idx = load_pq_index(spark, path)
    assert idx["manifest"].n_encoded == 300 and idx["manifest"].has_cells

    qvec = [float(x) + 0.01 for x in emb.filter(
        F.col("vec_id") == 42
    ).collect()[0]["embedding"]]
    got = [
        tuple(r)
        for r in ivfpq_query(idx, qvec, k=3, nprobe=4)
        .orderBy("rank")
        .collect()
    ]
    qdf = spark.createDataFrame(
        [(-1, qvec)], "vec_id long, embedding array<double>"
    )
    want = [
        (r.rank, r.n_id, r.adc_dist)
        for r in ivfpq_knn(qdf, emb, books, cells, k=3, nprobe=4)
        .orderBy("rank")
        .collect()
    ]
    assert got == want

    # partition pruning is in the executed plan, not post-scan
    probed_df = idx["codes"].filter(F.col("cluster_id").isin(0, 1))
    plan = probed_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan
    # and the flat serve path still works over the celled layout
    flat = pq_knn(qdf, idx["codes"], idx["codebooks"], k=3)
    assert flat.count() == 3


def test_ivfpq_query_validation(spark, emb, tmp_path):
    from noaa_oracle_spark.pipeline.pq import ivfpq_query, save_ivfpq_index

    books = pq_train(emb, m=4, k=8, iters=1)
    flat_path = str(tmp_path / "flat")
    save_pq_index(books, pq_encode(emb, books), flat_path)
    flat_idx = load_pq_index(spark, flat_path)
    with pytest.raises(ValueError, match="no coarse cells"):
        ivfpq_query(flat_idx, [0.0] * 16, k=3)

    path = str(tmp_path / "ivv")
    save_ivfpq_index(books, emb, emb.filter(F.col("vec_id") < 8), path)
    idx = load_pq_index(spark, path)
    with pytest.raises(ValueError, match="dims"):
        ivfpq_query(idx, [0.0] * 8, k=3)


def test_append_into_celled_index_keeps_partitioned_layout(
    spark, emb, tmp_path
):
    """Appending into a cell-partitioned index routes new vectors
    through the SAME frozen cells and lands them inside cluster_id=
    directories: ivfpq_query over the grown index equals the batch
    operator over the grown corpus."""
    from noaa_oracle_spark.pipeline.pq import (
        append_pq_index,
        ivfpq_query,
        save_ivfpq_index,
    )

    books = pq_train(emb.filter(F.col("vec_id") < 200), m=4, k=8, iters=1)
    cells = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "ivgrow")
    save_ivfpq_index(
        books, emb.filter(F.col("vec_id") < 200), cells, path
    )
    assert (
        append_pq_index(spark, path, emb.filter(F.col("vec_id") >= 200))
        == 100
    )
    idx = load_pq_index(spark, path)
    assert idx["manifest"].n_encoded == 300

    qvec = [float(x) for x in emb.filter(
        F.col("vec_id") == 250
    ).collect()[0]["embedding"]]
    got = [
        tuple(r)
        for r in ivfpq_query(idx, qvec, k=3, nprobe=4)
        .orderBy("rank")
        .collect()
    ]
    qdf = spark.createDataFrame(
        [(-1, qvec)], "vec_id long, embedding array<double>"
    )
    want = [
        (r.rank, r.n_id, r.adc_dist)
        for r in ivfpq_knn(qdf, emb, books, cells, k=3, nprobe=4)
        .orderBy("rank")
        .collect()
    ]
    assert got == want
    # vec 250's own id must surface at ~zero ADC distance
    assert got[0][1] == 250


def test_ivfpq_query_batch_equals_single_queries(spark, emb, tmp_path):
    """One partition-pruned job serving N vectors == N ivfpq_query
    calls, per-query exact (each vector scored against ONLY its own
    nprobe cells), with no corpus join in the plan."""
    from noaa_oracle_spark.pipeline.pq import (
        ivfpq_query,
        ivfpq_query_batch,
        save_ivfpq_index,
    )

    books = pq_train(emb, m=4, k=8, iters=1)
    cells = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "batch_idx")
    save_ivfpq_index(books, emb, cells, path)
    idx = load_pq_index(spark, path)

    vecs = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    ]
    batch = ivfpq_query_batch(idx, vecs, k=4, nprobe=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r.q_idx, []).append((r.rank, r.n_id, r.adc_dist))
    assert set(got) == {0, 1, 2}
    for i, v in enumerate(vecs):
        want = [
            (r.rank, r.n_id, r.adc_dist)
            for r in ivfpq_query(idx, v, k=4, nprobe=3).collect()
        ]
        assert sorted(got[i]) == sorted(want), i

    plan = (
        ivfpq_query_batch(idx, vecs, k=4, nprobe=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
    assert "PartitionFilters: [cluster_id" in plan or (
        "PartitionFilters: [isnotnull(cluster_id" in plan
    ) or "cluster_id" in plan.split("PartitionFilters")[1][:200], plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty query batch"):
        ivfpq_query_batch(idx, [], k=2)
    with _pytest.raises(ValueError, match="dims"):
        ivfpq_query_batch(idx, [[0.0, 1.0]], k=2)
