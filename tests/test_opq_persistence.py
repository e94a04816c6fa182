"""OPQ rotation persistence (r10 verdict ask #3): an OPQ-trained index
must round-trip to the serving tier — the dense rotation R rides in the
manifest, serve paths rotate RAW query vectors into the index's space,
and append applies the stored R to raw new vectors.  Without this, a
saved OPQ index would score unrotated queries against rotated codes and
return wrong neighbors."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.pq import (
    append_pq_index,
    compact_pq_index,
    ivfpq_knn,
    ivfpq_query,
    ivfpq_query_batch,
    load_pq_index,
    merge_pq_indexes,
    opq_train_rotation,
    pq_encode,
    pq_train,
    rotate_embeddings,
    save_ivfpq_index,
    save_pq_index,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(31)
    # anisotropic so the OPQ rotation is far from identity
    vecs = rng.randn(240, 16) * np.linspace(3.0, 0.2, 16)[None, :]
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(240)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def opq_idx(spark, emb, tmp_path_factory):
    """An IVF-PQ index trained entirely in OPQ-rotated space, saved with
    the rotation in the manifest."""
    rot = opq_train_rotation(emb, m=4)
    rotated = rotate_embeddings(emb, rot)
    books = pq_train(rotated, m=4, k=8, iters=1)
    cells = rotated.filter(F.col("vec_id") < 6)
    path = str(tmp_path_factory.mktemp("opq") / "idx")
    save_ivfpq_index(books, rotated, cells, path, rotation=rot)
    return {
        "path": path,
        "rot": rot,
        "rotated": rotated,
        "books": books,
        "cells": cells,
    }


def _raw_vec(emb, vid):
    return [
        float(x)
        for x in emb.filter(F.col("vec_id") == vid).collect()[0][
            "embedding"
        ]
    ]


def test_opq_index_round_trips_to_serving(spark, emb, opq_idx):
    """ivfpq_query over the loaded index, given the RAW query vector,
    equals the in-session OPQ path (rotate query + search the rotated
    corpus) — q109's math served from disk."""
    idx = load_pq_index(spark, opq_idx["path"])
    assert idx["rotation"] is not None
    np.testing.assert_allclose(idx["rotation"], opq_idx["rot"])

    spark_ = emb.sparkSession
    for vid in (0, 100, 239):
        raw = _raw_vec(emb, vid)
        got = [
            (r.rank, r.n_id, r.adc_dist)
            for r in ivfpq_query(idx, raw, k=3, nprobe=3)
            .orderBy("rank")
            .collect()
        ]
        # in-session: the same ROTATED vector under a sentinel id (the
        # serve path's discipline — ivfpq_knn's self-pair filter must
        # not drop the corpus twin of the query)
        rvec = [
            float(x)
            for x in opq_idx["rotated"]
            .filter(F.col("vec_id") == vid)
            .collect()[0]["embedding"]
        ]
        rq = spark_.createDataFrame(
            [(-1, rvec)], "vec_id long, embedding array<double>"
        )
        want = [
            (r.rank, r.n_id, r.adc_dist)
            for r in ivfpq_knn(
                rq,
                opq_idx["rotated"],
                opq_idx["books"],
                opq_idx["cells"],
                k=3,
                nprobe=3,
            )
            .orderBy("rank")
            .collect()
        ]
        # served-from-disk == in-session is the contract; self-at-rank-1
        # is NOT asserted (ADC is quantized — with m=4,k=8 another code
        # can beat the self code on anisotropic data)
        assert got == want, vid


def test_opq_index_batch_serving_rotates_the_batch(spark, emb, opq_idx):
    idx = load_pq_index(spark, opq_idx["path"])
    vids = [0, 100, 239]
    vecs = [_raw_vec(emb, v) for v in vids]
    batch = ivfpq_query_batch(idx, vecs, k=3, nprobe=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r.q_idx, []).append((r.rank, r.n_id, r.adc_dist))
    for i, v in enumerate(vecs):
        want = [
            (r.rank, r.n_id, r.adc_dist)
            for r in ivfpq_query(idx, v, k=3, nprobe=3).collect()
        ]
        assert sorted(got[i]) == sorted(want), i


def test_opq_append_rotates_raw_vectors(spark, emb, tmp_path):
    """append_pq_index into an OPQ index takes RAW vectors and encodes
    them under the stored rotation: the grown index serves identically
    to one rebuilt from the full rotated corpus."""
    rot = opq_train_rotation(emb, m=4)
    rotated = rotate_embeddings(emb, rot)
    base_rot = rotated.filter(F.col("vec_id") < 180)
    books = pq_train(base_rot, m=4, k=8, iters=1)
    cells = rotated.filter(F.col("vec_id") < 6)
    path = str(tmp_path / "grow")
    save_ivfpq_index(books, base_rot, cells, path, rotation=rot)
    n = append_pq_index(
        spark, path, emb.filter(F.col("vec_id") >= 180)
    )
    assert n == 60

    rebuilt_path = str(tmp_path / "rebuilt")
    save_ivfpq_index(books, rotated, cells, rebuilt_path, rotation=rot)

    grown = load_pq_index(spark, path)
    rebuilt = load_pq_index(spark, rebuilt_path)
    assert grown["manifest"].n_encoded == 240
    for vid in (5, 200, 239):
        raw = _raw_vec(emb, vid)
        got = sorted(
            tuple(r) for r in ivfpq_query(grown, raw, k=3, nprobe=3).collect()
        )
        want = sorted(
            tuple(r)
            for r in ivfpq_query(rebuilt, raw, k=3, nprobe=3).collect()
        )
        assert got == want, vid


def test_compact_preserves_rotation(spark, emb, opq_idx, tmp_path):
    out = str(tmp_path / "compacted")
    compact_pq_index(spark, opq_idx["path"], out)
    idx = load_pq_index(spark, out)
    assert idx["rotation"] is not None
    np.testing.assert_allclose(idx["rotation"], opq_idx["rot"])
    raw = _raw_vec(emb, 100)
    got = sorted(
        tuple(r) for r in ivfpq_query(idx, raw, k=3, nprobe=3).collect()
    )
    orig = load_pq_index(spark, opq_idx["path"])
    want = sorted(
        tuple(r) for r in ivfpq_query(orig, raw, k=3, nprobe=3).collect()
    )
    assert got == want


def test_merge_refuses_mixed_rotation(spark, emb, tmp_path):
    """Shard indexes rotated differently (or one rotated, one not) must
    refuse to merge — their codes are mutually meaningless."""
    rot = opq_train_rotation(emb, m=4)
    rotated = rotate_embeddings(emb, rot)
    lo_rot = rotated.filter(F.col("vec_id") < 120)
    lo_raw = emb.filter(F.col("vec_id") < 120)
    hi_raw = emb.filter(F.col("vec_id") >= 120)
    books = pq_train(lo_rot, m=4, k=8, iters=1)
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    save_pq_index(books, pq_encode(lo_rot, books), p1, rotation=rot)
    save_pq_index(books, pq_encode(hi_raw, books), p2)
    with pytest.raises(ValueError, match="rotation"):
        merge_pq_indexes(spark, [p1, p2], str(tmp_path / "out"))
    # same rotation on both sides merges fine
    p3 = str(tmp_path / "s3")
    hi_rot = rotated.filter(F.col("vec_id") >= 120)
    save_pq_index(books, pq_encode(hi_rot, books), p3, rotation=rot)
    merged_path = str(tmp_path / "merged")
    merge_pq_indexes(spark, [p1, p3], merged_path)
    merged = load_pq_index(spark, merged_path)
    assert merged["manifest"].n_encoded == 240
    np.testing.assert_allclose(merged["rotation"], rot)


def test_pre_rotation_manifest_still_loads(spark, emb, tmp_path):
    """Indexes saved before the rotation field existed (8-column
    manifest) keep loading, with rotation None."""
    books = pq_train(emb, m=4, k=8, iters=1)
    path = str(tmp_path / "legacy")
    save_pq_index(books, pq_encode(emb, books), path)
    meta = load_pq_index(spark, path)["manifest"]
    legacy = spark.createDataFrame(
        [
            (
                1,
                int(meta.m),
                int(meta.n_codes),
                int(meta.dim),
                meta.metric,
                False,
                meta.codebook_md5,
                int(meta.n_encoded),
            )
        ],
        "format_version int, m int, n_codes int, dim int, metric string, "
        "has_cells boolean, codebook_md5 string, n_encoded long",
    )
    legacy.write.mode("overwrite").parquet(f"{path}/manifest")
    idx = load_pq_index(spark, path)
    assert idx["rotation"] is None
