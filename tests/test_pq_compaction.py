"""compact_pq_index: rewriting a many-times-appended PQ/IVF-PQ index
into the fresh-save layout must leave every search result bit-identical
(the codes row SET is unchanged) while collapsing the per-cell file
count the appends accumulated — the vector twin of compact_bm25_index
(r10 verdict ask #2)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.pq import (
    append_pq_index,
    compact_pq_index,
    ivfpq_query,
    load_pq_index,
    pq_encode,
    pq_knn,
    pq_train,
    save_ivfpq_index,
    save_pq_index,
)
from noaa_oracle_spark.pipeline.text import _parquet_file_count


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(23)
    vecs = rng.randn(320, 16).astype(np.float32)
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(320)],
        "vec_id long, embedding array<float>",
    )


def _serve(idx, qvec, k=4, nprobe=4):
    return [
        tuple(r)
        for r in ivfpq_query(idx, qvec, k=k, nprobe=nprobe)
        .orderBy("rank")
        .collect()
    ]


def test_compact_celled_index_identical_results_fewer_files(
    spark, emb, tmp_path
):
    """grown == compacted == rebuilt, and compaction collapses the
    appended file sets to one file set per probed cell."""
    base = emb.filter(F.col("vec_id") < 200)
    books = pq_train(base, m=4, k=8, iters=1)
    cells = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "frag")
    save_ivfpq_index(books, base, cells, path)
    # 8 small appends — each lands its own file set inside the
    # cluster_id= directories
    for lo in range(200, 320, 15):
        n = append_pq_index(
            spark,
            path,
            emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 15)
            ),
        )
        assert n == 15
    grown = load_pq_index(spark, path)
    assert grown["manifest"].n_encoded == 320

    out = str(tmp_path / "compacted")
    stats = compact_pq_index(spark, path, out)
    assert stats["n_encoded"] == 320
    assert stats["codes_files_before"] == _parquet_file_count(
        spark, f"{path}/codes"
    )
    # appends fragmented the layout; compaction must collapse it
    assert stats["codes_files_after"] < stats["codes_files_before"]

    compacted = load_pq_index(spark, out)
    assert compacted["manifest"].n_encoded == 320
    assert (
        compacted["manifest"].codebook_md5 == grown["manifest"].codebook_md5
    )

    rebuilt_path = str(tmp_path / "rebuilt")
    save_ivfpq_index(books, emb, cells, rebuilt_path)
    rebuilt = load_pq_index(spark, rebuilt_path)

    for probe_id in (5, 210, 319):
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == probe_id).collect()[0][
                "embedding"
            ]
        ]
        got_grown = _serve(grown, qvec)
        got_compacted = _serve(compacted, qvec)
        got_rebuilt = _serve(rebuilt, qvec)
        assert got_compacted == got_grown, probe_id
        assert got_compacted == got_rebuilt, probe_id
        assert got_compacted[0][1] == probe_id  # self at ~zero ADC

    # the compacted layout keeps the serve-side partition pruning: one
    # file set per cell, still under cluster_id= directories
    import os

    cell_dirs = [
        d
        for d in os.listdir(f"{out}/codes")
        if d.startswith("cluster_id=")
    ]
    assert cell_dirs, "compacted codes lost the partitioned layout"
    for d in cell_dirs:
        files = [
            f
            for f in os.listdir(f"{out}/codes/{d}")
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)


def test_compact_flat_index_identical_results(spark, emb, tmp_path):
    base = emb.filter(F.col("vec_id") < 250)
    books = pq_train(base, m=4, k=8, iters=1)
    path = str(tmp_path / "flatfrag")
    save_pq_index(books, pq_encode(base, books), path)
    for lo in range(250, 320, 10):
        append_pq_index(
            spark,
            path,
            emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 10)
            ),
        )
    out = str(tmp_path / "flatcompact")
    stats = compact_pq_index(spark, path, out)
    assert stats["codes_files_after"] < stats["codes_files_before"]
    grown = load_pq_index(spark, path)
    compacted = load_pq_index(spark, out)
    q = emb.filter(F.col("vec_id") < 3)
    want = sorted(
        map(
            tuple,
            pq_knn(q, grown["codes"], grown["codebooks"], k=3).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            pq_knn(
                q, compacted["codes"], compacted["codebooks"], k=3
            ).collect(),
        )
    )
    assert got == want


def test_compact_rejects_in_place_rewrite(spark, emb, tmp_path):
    books = pq_train(emb, m=4, k=8, iters=1)
    path = str(tmp_path / "inplace")
    save_pq_index(books, pq_encode(emb, books), path)
    with pytest.raises(ValueError, match="must differ"):
        compact_pq_index(spark, path, path)
