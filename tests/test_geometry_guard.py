"""Quantization-ladder geometry diagnostics (round-6 verdict ask #4).

The 1M ladder (SCALE.md) measured that residual IVF-PQ and Matryoshka
prefix retrieval win on clustered / MRL-front-loaded embeddings and
collapse on isotropic ones.  These tests pin that operational rule as
machine-visible signals: `cell_geometry`'s between/within variance ratio
separates the two regimes by an order of magnitude, `prefix_energy`
detects front-loading, and the opt-in guards on `ivfpq_knn_residual` /
`matryoshka_knn` warn exactly on the losing geometry."""

from __future__ import annotations

import random
import warnings

import numpy as np
import pytest

from noaa_oracle_spark.pipeline.pq import ivfpq_knn_residual
from noaa_oracle_spark.pipeline.similarity import (
    cell_geometry,
    lloyd_refine,
    matryoshka_knn,
    prefix_energy,
)

DIM = 16


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def isotropic(spark):
    rnd = random.Random(11)
    return _df(
        spark,
        [(i, [rnd.gauss(0, 1) for _ in range(DIM)]) for i in range(300)],
    )


@pytest.fixture(scope="module")
def clustered(spark):
    rnd = random.Random(13)
    protos = [[rnd.gauss(0, 3) for _ in range(DIM)] for _ in range(8)]
    return _df(
        spark,
        [
            (i, [x + rnd.gauss(0, 0.05) for x in protos[i % 8]])
            for i in range(300)
        ],
    )


def test_cell_geometry_separates_regimes(spark, isotropic, clustered):
    cents_iso = lloyd_refine(isotropic, k=8, iters=1)
    cents_clu = lloyd_refine(clustered, k=8, iters=1)
    iso = cell_geometry(isotropic, cents_iso)
    clu = cell_geometry(clustered, cents_clu)
    assert iso["n"] == clu["n"] == 300 and iso["k"] == clu["k"] == 8
    # isotropic: cells explain almost nothing; clustered: nearly everything
    assert iso["ratio"] < 1.0 < clu["ratio"]
    assert clu["ratio"] > 10 * iso["ratio"]
    # scatter decomposition sanity: parts are non-negative and total
    # matches an independent numpy computation
    for d, frame in ((iso, isotropic), (clu, clustered)):
        mat = np.array([r.embedding for r in frame.collect()])
        total_np = float(((mat - mat.mean(axis=0)) ** 2).sum(axis=1).mean())
        assert d["within"] >= 0 and d["between"] >= -1e-9
        assert d["within"] + d["between"] == pytest.approx(total_np, rel=1e-6)


def test_prefix_energy_detects_front_loading(spark, isotropic):
    rnd = random.Random(17)
    # front-loaded: leading 4 dims carry ~100× the variance of the tail
    mrl = _df(
        spark,
        [
            (
                i,
                [rnd.gauss(0, 10) for _ in range(4)]
                + [rnd.gauss(0, 0.5) for _ in range(DIM - 4)],
            )
            for i in range(300)
        ],
    )
    flat = prefix_energy(isotropic, 4)
    front = prefix_energy(mrl, 4)
    assert flat["uniform_floor"] == front["uniform_floor"] == 4 / DIM
    assert flat["energy"] < 2 * flat["uniform_floor"]
    assert front["energy"] > 0.9


def test_residual_guard_warns_only_on_isotropic(spark, isotropic, clustered):
    for frame, should_warn in ((isotropic, True), (clustered, False)):
        cents = lloyd_refine(frame, k=8, iters=1)
        qs = frame.limit(2)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            ivfpq_knn_residual(
                qs, frame, cents, m=4, k_codes=8, geometry_guard=True
            ).collect()
        hits = [w for w in rec if "ivfpq_knn_residual" in str(w.message)]
        assert bool(hits) == should_warn, frame


def test_matryoshka_guard_warns_only_without_front_loading(spark, isotropic):
    qs = isotropic.limit(2)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        matryoshka_knn(qs, isotropic, d_prefix=4, geometry_guard=True).collect()
    assert any("matryoshka_knn" in str(w.message) for w in rec)
    # guard off by default: no warning
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        matryoshka_knn(qs, isotropic, d_prefix=4).collect()
    assert not any("matryoshka_knn" in str(w.message) for w in rec)


def test_cell_geometry_empty_corpus_raises_cleanly(spark, clustered):
    cents = lloyd_refine(clustered, k=4, iters=0)
    empty = clustered.filter("vec_id < 0")
    with pytest.raises(ValueError, match="empty corpus"):
        cell_geometry(empty, cents)
