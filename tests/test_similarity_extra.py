"""IVF ANN and embedding-cosine near-dup: behavior beyond the oracle gate.

The suite gate (test_suite_oracle) proves q29/q30 hash-match DuckDB; these
tests pin the *quality* properties that make the operators useful — IVF
recall against the exact baseline, and the near-dup pair set against an
independent numpy computation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.similarity import (
    brute_force_knn,
    embedding_cosine_pairs,
    ivf_knn,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_ivf_recall_floor(spark, emb):
    """nprobe=4 of nlist=16 cells must retain >=0.8 recall@5 vs exact
    (measured 0.94 at sf0.001, 0.92 at sf0.01)."""
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.q_id, r.n_id) for r in brute_force_knn(q, emb, k=5).collect()}
    approx = {
        (r.q_id, r.n_id)
        for r in ivf_knn(q, emb, k=5, nlist=16, nprobe=4).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.8


def test_ivf_full_probe_is_exact(spark, emb):
    """Probing every cell degenerates IVF to the exact search — the
    correctness anchor for the cell-partitioning logic."""
    q = emb.filter(F.col("vec_id") < 5)
    exact = [
        (r.q_id, r.rank, r.n_id)
        for r in brute_force_knn(q, emb, k=3).collect()
    ]
    full = [
        (r.q_id, r.rank, r.n_id)
        for r in ivf_knn(q, emb, k=3, nlist=16, nprobe=16).collect()
    ]
    assert sorted(exact) == sorted(full)


def test_embedding_pairs_vs_numpy(spark, emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    expected = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and sims[i, j] >= 0.4:
                expected.add((int(ids[i]), int(ids[j])))
    got = {
        (r.doc_a, r.doc_b)
        for r in embedding_cosine_pairs(emb, threshold=0.4).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_embedding_pairs_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = embedding_cosine_pairs(empty, threshold=0.4)
    assert out.count() == 0
    assert out.columns == ["doc_a", "doc_b", "cos_sim"]
