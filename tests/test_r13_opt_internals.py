"""r13 optimization-round internals: the index-manifest FILE LEDGER that
makes validated loads O(1) (one globStatus listing) instead of a Spark
count job whose listing/footer cost grows with accumulated appends —
the r12 "Not yet optimized" #2 item, both index families.

Pinned invariants:

  * the ledger equals the on-disk truth after save / append / merge /
    compact, and the manifest row count still equals the on-disk ROW
    truth (the row-level check the validated load no longer re-runs);
  * `min_vec_id` served from the manifest equals the true id floor
    through every maintenance op;
  * a planted orphan file (torn append) fails the validated load;
  * a LEGACY manifest (predating the ledger) still loads through the
    original row-count path — and still rejects a row-level tear.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.pq import (
    append_pq_index,
    compact_pq_index,
    load_pq_index,
    pq_encode,
    pq_train,
    save_pq_index,
)
from noaa_oracle_spark.pipeline.text import (
    _parquet_file_count,
    append_bm25_index,
    load_bm25_index,
    save_bm25_index,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(180, 16).astype(np.float32)
    return spark.createDataFrame(
        [(i + 3, [float(x) for x in vecs[i]]) for i in range(180)],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def docs(spark):
    words = ["alpha", "beta", "gamma", "delta"]
    rows = [
        (i, " ".join(words[(i + j) % 4] for j in range(4)))
        for i in range(90)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pq_ledger_matches_disk_and_rows(spark, emb, tmp_path):
    books = pq_train(emb, m=4, k=8, iters=1)
    path = str(tmp_path / "idx")
    v = F.col("vec_id")
    save_pq_index(books, pq_encode(emb.filter(v < 100), books), path)
    append_pq_index(spark, path, emb.filter((v >= 100) & (v < 140)))
    append_pq_index(spark, path, emb.filter(v >= 140))
    idx = load_pq_index(spark, path)  # validated via the ledger
    meta = idx["manifest"]
    # ledger == on-disk file truth
    assert int(meta.n_code_files) == _parquet_file_count(
        spark, f"{path}/codes"
    )
    # manifest row count == on-disk ROW truth (the check the validated
    # load no longer re-runs — pinned here instead)
    assert spark.read.parquet(f"{path}/codes").count() == int(
        meta.n_encoded
    )
    # the id floor survives maintenance exactly (fixture ids start at 3)
    assert idx["min_vec_id"] == 3

    compacted = str(tmp_path / "cidx")
    compact_pq_index(spark, path, compacted)
    cidx = load_pq_index(spark, compacted)
    assert int(cidx["manifest"].n_code_files) == _parquet_file_count(
        spark, f"{compacted}/codes"
    )
    assert cidx["min_vec_id"] == 3


def test_pq_ledger_detects_orphan_file(spark, emb, tmp_path):
    books = pq_train(emb, m=4, k=8, iters=1)
    path = str(tmp_path / "torn")
    v = F.col("vec_id")
    save_pq_index(books, pq_encode(emb.filter(v < 100), books), path)
    # torn append: codes land, manifest rewrite dies
    pq_encode(emb.filter(v >= 100), books).write.mode("append").parquet(
        f"{path}/codes"
    )
    with pytest.raises(ValueError, match="inconsistent index"):
        load_pq_index(spark, path)


def test_pq_legacy_manifest_falls_back_to_row_count(spark, emb, tmp_path):
    from noaa_oracle_spark.pipeline.metaio import (
        read_meta_rows,
        write_meta_rows,
    )

    books = pq_train(emb, m=4, k=8, iters=1)
    path = str(tmp_path / "legacy")
    v = F.col("vec_id")
    save_pq_index(books, pq_encode(emb, books), path)
    # rewrite the manifest WITHOUT the ledger fields (a pre-r13 index)
    meta = read_meta_rows(spark, f"{path}/manifest")[0]
    legacy_schema = (
        "format_version int, m int, n_codes int, dim int, metric string, "
        "has_cells boolean, codebook_md5 string, n_encoded long, "
        "rotation array<double>"
    )
    write_meta_rows(
        spark, f"{path}/manifest", legacy_schema,
        [(1, meta.m, meta.n_codes, meta.dim, meta.metric, meta.has_cells,
          meta.codebook_md5, meta.n_encoded, meta.rotation)],
    )
    idx = load_pq_index(spark, path)  # row-count path
    assert idx["manifest"].n_encoded == 180
    assert idx["min_vec_id"] == 3  # from the aggregate, not the manifest
    # and the legacy path still rejects a row-level tear
    pq_encode(emb.filter(v < 10), books).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "codes"
    ).write.mode("append").parquet(f"{path}/codes")
    with pytest.raises(ValueError, match="inconsistent index"):
        load_pq_index(spark, path)


def test_bm25_ledger_matches_disk_and_rows(spark, docs, tmp_path):
    path = str(tmp_path / "bidx")
    d = F.col("doc_id")
    save_bm25_index(docs.filter(d < 50), path)
    append_bm25_index(spark, path, docs.filter(d >= 50))
    idx = load_bm25_index(spark, path)  # validated via the ledger
    meta = idx["manifest"]
    assert int(meta.n_postings_files) == _parquet_file_count(
        spark, f"{path}/postings"
    )
    assert spark.read.parquet(f"{path}/postings").count() == int(
        meta.n_postings
    )


def test_bm25_legacy_manifest_falls_back_to_row_count(
    spark, docs, tmp_path
):
    from noaa_oracle_spark.pipeline.metaio import (
        read_meta_rows,
        write_meta_rows,
    )

    path = str(tmp_path / "blegacy")
    save_bm25_index(docs, path)
    meta = read_meta_rows(spark, f"{path}/manifest")[0]
    legacy_schema = (
        "format_version int, n_docs long, avgdl double, "
        "n_postings long, id_col string"
    )
    write_meta_rows(
        spark, f"{path}/manifest", legacy_schema,
        [(1, meta.n_docs, meta.avgdl, meta.n_postings, meta.id_col)],
    )
    idx = load_bm25_index(spark, path)  # row-count path
    assert idx["manifest"].n_docs == 90
    # and the legacy path still rejects a row-level tear
    spark.createDataFrame(
        [(9999, "zeta", 1)], "doc_id long, term string, tf long"
    ).write.mode("append").parquet(f"{path}/postings")
    with pytest.raises(ValueError, match="torn or partial"):
        load_bm25_index(spark, path)
