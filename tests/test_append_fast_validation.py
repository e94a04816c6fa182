"""O(new shard) append validation (r11 verdict ask #2): the default
append path updates the index manifest ARITHMETICALLY from one bounded
pass over the new shard — never a recount across every accumulated
file — and `verify=True` restores the full recount.  The invariants
pinned here:

  * fast-append manifests are exactly what a full recount produces
    (the subsequent default `load_*_index` full validation passes, and
    the BM25 avgdl double is bit-equal to the recompute path's);
  * the fast path never "heals" a torn index — appending on top of a
    crash window still leaves a count mismatch the next validated load
    rejects loudly;
  * `verify=True` still works and produces the same manifest.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.pq import (
    append_pq_index,
    load_pq_index,
    pq_encode,
    pq_train,
    save_pq_index,
)
from noaa_oracle_spark.pipeline.text import (
    append_bm25_index,
    bm25_query,
    load_bm25_index,
    save_bm25_index,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(23)
    vecs = rng.randn(240, 16).astype(np.float32)
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(240)],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def docs(spark):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (i, " ".join(words[(i + j) % len(words)] for j in range(3 + i % 5)))
        for i in range(120)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pq_fast_append_manifest_survives_full_validation(
    spark, emb, tmp_path
):
    books = pq_train(emb, m=4, k=8, iters=1)
    base = emb.filter(F.col("vec_id") < 120)
    path = str(tmp_path / "fast")
    save_pq_index(books, pq_encode(base, books), path)
    for lo, hi in [(120, 180), (180, 240)]:
        n = append_pq_index(
            spark,
            path,
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
        )
        assert n == hi - lo
    # default load runs the FULL recount — it passing proves the
    # arithmetic manifest equals the on-disk truth
    idx = load_pq_index(spark, path)
    assert idx["manifest"].n_encoded == 240


def test_pq_verify_append_matches_fast(spark, emb, tmp_path):
    books = pq_train(emb, m=4, k=8, iters=1)
    base = emb.filter(F.col("vec_id") < 120)
    shard = emb.filter(F.col("vec_id") >= 120)
    p_fast, p_slow = str(tmp_path / "f"), str(tmp_path / "s")
    for p in (p_fast, p_slow):
        save_pq_index(books, pq_encode(base, books), p)
    append_pq_index(spark, p_fast, shard)
    append_pq_index(spark, p_slow, shard, verify=True)
    mf = load_pq_index(spark, p_fast)["manifest"]
    ms = load_pq_index(spark, p_slow)["manifest"]
    assert mf.n_encoded == ms.n_encoded == 240
    assert mf.codebook_md5 == ms.codebook_md5


def test_pq_fast_append_does_not_heal_torn_index(spark, emb, tmp_path):
    """Crash window (codes landed, manifest didn't) + a fast append on
    top: the arithmetic manifest is still short of the on-disk rows,
    so validated load keeps rejecting — the tear is never masked."""
    books = pq_train(emb, m=4, k=8, iters=1)
    path = str(tmp_path / "torn")
    save_pq_index(
        books, pq_encode(emb.filter(F.col("vec_id") < 120), books), path
    )
    # simulate the tear: 60 orphan rows with no manifest update
    pq_encode(
        emb.filter((F.col("vec_id") >= 120) & (F.col("vec_id") < 180)),
        books,
    ).write.mode("append").parquet(f"{path}/codes")
    # fast append of a DISJOINT shard on top (skip the disjoint check —
    # it would load codes lazily anyway; the point is the manifest math)
    append_pq_index(
        spark,
        path,
        emb.filter(F.col("vec_id") >= 180),
        check_disjoint=False,
    )
    with pytest.raises(ValueError, match="inconsistent index"):
        load_pq_index(spark, path)


def test_bm25_fast_append_avgdl_bit_equal_to_recompute(
    spark, docs, tmp_path
):
    p_fast, p_slow = str(tmp_path / "bf"), str(tmp_path / "bs")
    base = docs.filter(F.col("doc_id") < 60)
    for p in (p_fast, p_slow):
        save_bm25_index(base, p)
    for lo, hi in [(60, 90), (90, 120)]:
        shard = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        assert append_bm25_index(spark, p_fast, shard) == hi - lo
        assert (
            append_bm25_index(spark, p_slow, shard, verify=True) == hi - lo
        )
    mf = load_bm25_index(spark, p_fast)["manifest"]
    ms = load_bm25_index(spark, p_slow)["manifest"]
    assert mf.n_docs == ms.n_docs == 120
    assert mf.n_postings == ms.n_postings
    # the arithmetic avgdl must be the SAME double the full recompute
    # produces (exact integer token total either way)
    assert mf.avgdl == ms.avgdl
    # and scores off the fast-grown index equal the verify-grown one
    q = ["alpha", "delta"]
    fast = [tuple(r) for r in bm25_query(
        load_bm25_index(spark, p_fast), q, k=5).collect()]
    slow = [tuple(r) for r in bm25_query(
        load_bm25_index(spark, p_slow), q, k=5).collect()]
    assert fast == slow


def test_bm25_fast_append_does_not_heal_torn_index(spark, docs, tmp_path):
    from noaa_oracle_spark.pipeline.text import _bm25_tf

    path = str(tmp_path / "btorn")
    save_bm25_index(docs.filter(F.col("doc_id") < 60), path)
    # tear: postings land, doclens + manifest don't
    _bm25_tf(
        docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 90)),
        "text",
        "doc_id",
    ).write.mode("append").parquet(f"{path}/postings")
    append_bm25_index(
        spark,
        path,
        docs.filter(F.col("doc_id") >= 90),
        check_disjoint=False,
    )
    # r13: detected by the O(1) file-ledger check (the appended manifest
    # records old-ledger + delta, never a fresh directory count, so the
    # orphan files stay un-adopted); the legacy row-count path raises
    # the same "torn or partial" class
    with pytest.raises(ValueError, match="torn or partial"):
        load_bm25_index(spark, path)


def test_merge_rejects_torn_shard_before_manifest(spark, emb, docs, tmp_path):
    """r12: merges skip the per-shard pre-scan, so the loud gate is the
    post-union output count vs the SUM of shard manifests — a planted
    torn shard must abort BEFORE the merged manifest exists (out_path
    unloadable), for both families."""
    from noaa_oracle_spark.pipeline.pq import merge_pq_indexes
    from noaa_oracle_spark.pipeline.text import (
        _bm25_tf,
        merge_bm25_indexes,
        save_bm25_index,
    )

    # --- PQ: shard B gets orphan codes (append died pre-manifest) ----
    books = pq_train(emb.filter(F.col("vec_id") < 120), m=4, k=8, iters=1)
    pa, pb = str(tmp_path / "pa"), str(tmp_path / "pb")
    save_pq_index(
        books, pq_encode(emb.filter(F.col("vec_id") < 80), books), pa
    )
    save_pq_index(
        books,
        pq_encode(
            emb.filter((F.col("vec_id") >= 80) & (F.col("vec_id") < 160)),
            books,
        ),
        pb,
    )
    pq_encode(emb.filter(F.col("vec_id") >= 160), books).write.mode(
        "append"
    ).parquet(f"{pb}/codes")  # the tear
    out = str(tmp_path / "pm")
    with pytest.raises(ValueError, match="torn"):
        merge_pq_indexes(spark, [pa, pb], out, check_disjoint=False)
    import os
    assert not os.path.exists(f"{out}/manifest")

    # --- BM25: shard B gets orphan postings -------------------------
    ba, bb = str(tmp_path / "ba"), str(tmp_path / "bb")
    save_bm25_index(docs.filter(F.col("doc_id") < 40), ba)
    save_bm25_index(
        docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 80)), bb
    )
    _bm25_tf(
        docs.filter(F.col("doc_id") >= 80), "text", "doc_id"
    ).write.mode("append").parquet(f"{bb}/postings")  # the tear
    bout = str(tmp_path / "bm")
    with pytest.raises(ValueError, match="torn"):
        merge_bm25_indexes(spark, [ba, bb], bout, check_disjoint=False)
    assert not os.path.exists(f"{bout}/manifest")


def test_merge_default_path_names_torn_shard_not_overlap(
    spark, emb, docs, tmp_path
):
    """r12 review: with the DEFAULT check_disjoint, orphan rows from an
    append that died pre-manifest used to misreport as a negative
    'overlap' (on-disk distinct ids > summed manifests) — the merge
    must name the real condition (torn shard) for both families."""
    import os

    from noaa_oracle_spark.pipeline.pq import merge_pq_indexes
    from noaa_oracle_spark.pipeline.text import (
        merge_bm25_indexes,
        save_bm25_index,
    )

    # --- PQ: orphan CODES rows with fresh ids ------------------------
    books = pq_train(emb.filter(F.col("vec_id") < 120), m=4, k=8, iters=1)
    pa, pb = str(tmp_path / "pa"), str(tmp_path / "pb")
    save_pq_index(
        books, pq_encode(emb.filter(F.col("vec_id") < 80), books), pa
    )
    save_pq_index(
        books,
        pq_encode(
            emb.filter((F.col("vec_id") >= 80) & (F.col("vec_id") < 160)),
            books,
        ),
        pb,
    )
    pq_encode(emb.filter(F.col("vec_id") >= 160), books).write.mode(
        "append"
    ).parquet(f"{pb}/codes")  # the tear: fresh ids beyond the manifests
    out = str(tmp_path / "pm")
    with pytest.raises(ValueError, match="torn"):
        merge_pq_indexes(spark, [pa, pb], out)  # default check_disjoint
    assert not os.path.exists(f"{out}/manifest")

    # --- BM25: orphan DOCLENS rows with fresh ids --------------------
    ba, bb = str(tmp_path / "ba"), str(tmp_path / "bb")
    save_bm25_index(docs.filter(F.col("doc_id") < 40), ba)
    save_bm25_index(
        docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 80)), bb
    )
    dl = spark.read.parquet(f"{bb}/doclens")
    dl.withColumn("doc_id", F.col("doc_id") + 1000).write.mode(
        "append"
    ).parquet(f"{bb}/doclens")  # the tear
    bout = str(tmp_path / "bm")
    with pytest.raises(ValueError, match="torn"):
        merge_bm25_indexes(spark, [ba, bb], bout)
    assert not os.path.exists(f"{bout}/manifest")

    # a GENUINE overlap still reports as overlap on the default path
    pc = str(tmp_path / "pc")
    save_pq_index(
        books, pq_encode(emb.filter(F.col("vec_id") < 60), books), pc
    )
    with pytest.raises(ValueError, match="overlap"):
        merge_pq_indexes(spark, [pa, pc], str(tmp_path / "po"))
