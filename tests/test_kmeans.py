"""k-means operators: assignment correctness vs a numpy mirror, the Lloyd
update vs exact per-dimension means, inertia monotonicity over iterations,
and the plan-shape guarantee (assignment is a pure map — no exchange)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.similarity import kmeans_assign, kmeans_update

SF_DIR = "/root/testdata/sf0.001"
K = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _np_corpus(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    order = np.argsort(ids)
    return ids[order], mat[order]


def _np_assign(points_ids, points, cents_ids, cents):
    pn = points / np.linalg.norm(points, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    sims = np.round(pn @ cn.T, 6)
    # argmax with lowest-centroid-id tiebreak: argmax returns the first
    # (lowest index == lowest cid after sorting) maximal entry
    best = sims.argmax(axis=1)
    return {int(p): int(cents_ids[b]) for p, b in zip(points_ids, best)}


def test_assignment_matches_numpy(spark, emb):
    seeds = emb.filter(F.col("vec_id") < K)
    pts = emb.filter(F.col("vec_id") >= K)
    got = {
        r.vec_id: r.cluster_id
        for r in kmeans_assign(pts, seeds).select("vec_id", "cluster_id").collect()
    }
    all_ids, all_mat = _np_corpus(emb)
    want = _np_assign(
        all_ids[K:], all_mat[K:], all_ids[:K], all_mat[:K]
    )
    assert got == want


def test_update_matches_numpy_means(spark, emb):
    seeds = emb.filter(F.col("vec_id") < K)
    pts = emb.filter(F.col("vec_id") >= K)
    assigned = kmeans_assign(pts, seeds)
    got = {
        (r.cluster_id, r.dim): r.centroid_val
        for r in kmeans_update(assigned).collect()
    }
    all_ids, all_mat = _np_corpus(emb)
    amap = _np_assign(all_ids[K:], all_mat[K:], all_ids[:K], all_mat[:K])
    for cid in range(K):
        members = all_mat[K:][[amap[int(i)] == cid for i in all_ids[K:]]]
        if len(members) == 0:
            continue
        mean = members.mean(axis=0)
        for d in range(all_mat.shape[1]):
            assert got[(cid, d)] == pytest.approx(round(mean[d], 6), abs=2e-6)


def test_lloyd_iterations_reduce_inertia(spark, emb):
    """Two Lloyd steps: cosine inertia (1 - mean best-sim) must not
    increase — the textbook convergence property, driven through the
    DataFrame operators end to end."""
    pts = emb.filter(F.col("vec_id") >= K)
    cents = emb.filter(F.col("vec_id") < K)
    losses = []
    for _ in range(2):
        assigned = kmeans_assign(pts, cents)
        losses.append(
            1.0 - assigned.agg(F.avg("cos_sim")).first()[0]
        )
        long_form = kmeans_update(assigned)
        rows = long_form.collect()
        by_cid: dict[int, list] = {}
        for r in rows:
            by_cid.setdefault(r.cluster_id, [None] * 64)[r.dim] = r.centroid_val
        cents = spark.createDataFrame(
            [(cid, vec) for cid, vec in sorted(by_cid.items())],
            "vec_id long, embedding array<double>",
        )
    assert losses[1] <= losses[0] + 1e-9, losses


def test_assignment_plan_has_no_exchange(spark, emb):
    seeds = emb.filter(F.col("vec_id") < K)
    plan = (
        kmeans_assign(emb.filter(F.col("vec_id") >= K), seeds)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_numpy_backend_matches_expr(spark, emb):
    seeds = emb.filter(F.col("vec_id") < K)
    pts = emb.filter(F.col("vec_id") >= K)
    expr = {
        (r.vec_id, r.cluster_id, r.cos_sim)
        for r in kmeans_assign(pts, seeds, backend="expr")
        .select("vec_id", "cluster_id", "cos_sim").collect()
    }
    np_ = {
        (r.vec_id, r.cluster_id, r.cos_sim)
        for r in kmeans_assign(pts, seeds, backend="numpy")
        .select("vec_id", "cluster_id", "cos_sim").collect()
    }
    assert expr == np_
