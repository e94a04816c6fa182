"""Unit tests for Matryoshka prefix-truncation retrieval
(similarity.matryoshka_knn) and deterministic weighted epoch
upsampling (sampling.epoch_upsample)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.sampling import epoch_upsample
from noaa_oracle_spark.pipeline.similarity import (
    brute_force_knn,
    matryoshka_knn,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------- matryoshka


def _emb(spark, n=60, d=32, seed=5):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, d).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_matryoshka_equals_bruteforce_on_sliced_vectors(spark):
    """The prefix ranking must be EXACTLY brute_force_knn run on
    pre-sliced vectors — same ids, ranks, and rounded cosines."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    got = {
        (r.q_id, r.rank): (r.n_id, r.cos_prefix)
        for r in matryoshka_knn(q, emb, d_prefix=8, k=4).collect()
    }
    sliced = emb.withColumn("embedding", F.slice("embedding", 1, 8))
    want = {
        (r.q_id, r.rank): (r.n_id, r.cos_sim)
        for r in brute_force_knn(
            sliced.filter(F.col("vec_id") < 5), sliced, k=4
        ).collect()
    }
    assert got == want


def test_matryoshka_full_cosine_is_the_true_pair_cosine(spark):
    emb = _emb(spark, n=30, d=16)
    pdf = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in emb.collect()}
    rows = matryoshka_knn(
        emb.filter(F.col("vec_id") < 3), emb, d_prefix=4, k=3
    ).collect()
    assert len(rows) == 9
    for r in rows:
        a, b = pdf[r.q_id], pdf[r.n_id]
        want = float(a @ b) / (
            math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))
        )
        assert abs(r.cos_full - want) < 1e-5
        # prefix cosine likewise matches the sliced-vector definition
        ap, bp = a[:4], b[:4]
        wantp = float(ap @ bp) / (
            math.sqrt(float(ap @ ap)) * math.sqrt(float(bp @ bp))
        )
        assert abs(r.cos_prefix - wantp) < 1e-5


def test_matryoshka_full_prefix_is_plain_knn(spark):
    """d_prefix = d degenerates to brute_force_knn with cos_full ==
    cos_prefix on every selected pair."""
    emb = _emb(spark, n=25, d=12)
    rows = matryoshka_knn(
        emb.filter(F.col("vec_id") < 4), emb, d_prefix=12, k=3
    ).collect()
    assert all(r.cos_full == r.cos_prefix for r in rows)


# ----------------------------------------------------------- epoch upsample


def _hash_bucket(key: str, salt: str = "epoch") -> int:
    return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:3], 16)


def test_epoch_upsample_copy_counts_match_definition(spark):
    rows = [(i, 0.5 + i * 0.37) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double").filter(
        F.col("w") <= 50
    )
    got = {}
    for r in epoch_upsample(df, "id", "w", max_weight=80.0).collect():
        got[r.id] = max(got.get(r.id, 0), r.epoch)
        assert r.epoch >= 1
    for i, w in rows:
        if w > 50:
            continue
        frac = w - math.floor(w)
        want = int(math.floor(w)) + (
            1 if _hash_bucket(str(i)) < math.floor(frac * 4096) else 0
        )
        assert got.get(i, 0) == want, (i, w)


def test_epoch_upsample_integer_weights_are_exact(spark):
    df = spark.createDataFrame(
        [(i, float(1 + i % 3)) for i in range(90)], "id long, w double"
    )
    counts = {}
    for r in epoch_upsample(df, "id", "w").collect():
        counts[r.id] = counts.get(r.id, 0) + 1
    assert all(counts[i] == 1 + i % 3 for i in range(90))


def test_epoch_upsample_expected_mass(spark):
    """Total emitted rows ≈ Σw (the mixture contract) on a fixed corpus."""
    df = spark.createDataFrame(
        [(i, 1.5) for i in range(2000)], "id long, w double"
    )
    n = epoch_upsample(df, "id", "w").count()
    assert abs(n - 3000) / 3000 < 0.05


def test_epoch_upsample_subsamples_below_one(spark):
    df = spark.createDataFrame(
        [(i, 0.25) for i in range(4000)], "id long, w double"
    )
    n = epoch_upsample(df, "id", "w").count()
    assert abs(n - 1000) / 1000 < 0.15
    # and it is exactly hash_sample's selection rule: epoch is always 1
    assert epoch_upsample(df, "id", "w").filter(F.col("epoch") != 1).count() == 0


def test_training_mix_composition_invariants(spark):
    """q127's composed mix: eval splits are NEVER upsampled (n_rows ==
    n_docs for val/test), no doc appears in two splits, and the total
    unique docs equal the classifier's keep set."""
    from noaa_oracle_spark.suite_pipeline import q127_training_mix
    from noaa_oracle_spark.pipeline.text import quality_classifier

    rows = q127_training_mix(spark, SF_DIR).collect()
    splits = {r.split for r in rows}
    assert splits <= {"train", "val", "test"}
    for r in rows:
        if r.split != "train":
            assert r.n_rows == r.n_docs  # eval: exactly one copy each
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_keep = quality_classifier(docs).filter(F.col("keep") == 1).count()
    # train may drop docs with w < 1 (subsampling semantics) but val/test
    # plus train uniques can never exceed the keep set
    assert sum(r.n_docs for r in rows) <= n_keep
    n_eval = sum(r.n_docs for r in rows if r.split != "train")
    assert n_eval > 0


def test_epoch_upsample_overweight_raises(spark):
    df = spark.createDataFrame([(1, 500.0)], "id long, w double")
    with pytest.raises(Exception) as exc:
        epoch_upsample(df, "id", "w", max_weight=100.0).collect()
    assert "max_weight" in str(exc.value)


def test_hash_split_and_upsample_null_keys_raise(spark):
    """NULL keys/weights fail loudly instead of silently landing in the
    last split (hash_split) or vanishing (epoch_upsample)."""
    from noaa_oracle_spark.pipeline.sampling import epoch_upsample, hash_split

    df = spark.createDataFrame([(1, 1.5), (None, 2.0)], "id long, w double")
    with pytest.raises(Exception, match="NULL"):
        hash_split(df, "id").collect()
    with pytest.raises(Exception, match="NULL"):
        epoch_upsample(df, "id", "w").collect()
    dfw = spark.createDataFrame([(1, 1.5), (2, None)], "id long, w double")
    with pytest.raises(Exception, match="NULL"):
        epoch_upsample(dfw, "id", "w").collect()


def test_epoch_upsample_negative_and_nan_weights_raise(spark):
    """Negative and NaN weights are mixture bugs and raise; w == 0 is a
    legitimate exclude and stays silent (like hash_sample)."""
    neg = spark.createDataFrame([(1, -2.3)], "id long, w double")
    with pytest.raises(Exception, match="negative"):
        epoch_upsample(neg, "id", "w").collect()
    nan = spark.createDataFrame([(1, float("nan"))], "id long, w double")
    with pytest.raises(Exception, match="NaN"):
        epoch_upsample(nan, "id", "w").collect()
    zero = spark.createDataFrame([(1, 0.0), (2, 2.0)], "id long, w double")
    rows = epoch_upsample(zero, "id", "w").collect()
    assert sorted(r.id for r in rows) == [2, 2]


def test_hash_split_subgrid_fraction_raises(spark):
    """A fraction below the 1/4096 hash-grid resolution would produce a
    permanently empty split — rejected at construction."""
    from noaa_oracle_spark.pipeline.sampling import hash_split

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="empty"):
        hash_split(
            df, "id",
            splits=(("train", 0.99995), ("val", 0.00004),
                    ("test", 0.00001)),
        )
