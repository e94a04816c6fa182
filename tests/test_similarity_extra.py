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


def test_ivf_with_lloyd_trained_centroids(spark, emb):
    """lloyd_refine-trained cells plugged into ivf_knn: what training
    guarantees is balanced cell OCCUPANCY (the probe-cost bound at scale
    — a seed cell that captures half the corpus makes nprobe meaningless),
    not higher recall on isotropic data (measured: seed 0.94 vs trained
    0.88 recall@5 on the gaussian test embeddings — no cluster structure
    to exploit). Assert the occupancy spread shrinks and recall stays
    above the ANN floor."""
    import statistics

    from noaa_oracle_spark.pipeline.similarity import (
        kmeans_assign,
        lloyd_refine,
    )

    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.q_id, r.n_id) for r in brute_force_knn(q, emb, k=5).collect()}
    trained = lloyd_refine(emb, k=16, iters=2)

    def occupancy(cent_df):
        sizes = [
            r.n
            for r in kmeans_assign(emb, cent_df, backend="numpy")
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        sizes += [0] * (16 - len(sizes))
        return statistics.pstdev(sizes)

    seeds = emb.filter(F.col("vec_id") < 16)
    assert occupancy(trained) < occupancy(seeds)

    got = {
        (r.q_id, r.n_id)
        for r in ivf_knn(
            q, emb, k=5, nlist=16, nprobe=4, centroids=trained
        ).collect()
    }
    assert len(exact & got) / len(exact) >= 0.8


def test_lloyd_refine_shapes_and_determinism(spark, emb):
    from noaa_oracle_spark.pipeline.similarity import lloyd_refine

    a = lloyd_refine(emb, k=8, iters=1)
    rows = a.collect()
    assert sorted(r.vec_id for r in rows) == list(range(8))
    assert all(len(r.embedding) == 64 for r in rows)
    b = lloyd_refine(emb, k=8, iters=1)
    assert sorted(map(str, rows)) == sorted(map(str, b.collect()))


def test_blocked_pairs_match_broadcast(spark, emb):
    """The block-pair join must reproduce the broadcast kernel bit-for-bit
    at ANY block count — block assignment only routes work."""
    base = sorted(
        map(tuple, embedding_cosine_pairs(emb, threshold=0.4).collect())
    )
    assert len(base) > 0
    from noaa_oracle_spark.pipeline.similarity import (
        embedding_cosine_pairs_blocked,
    )

    for nb in (1, 3, 8):
        got = sorted(
            map(
                tuple,
                embedding_cosine_pairs_blocked(
                    emb, threshold=0.4, num_blocks=nb
                ).collect(),
            )
        )
        assert got == base, f"num_blocks={nb}"


def test_blocked_pairs_no_driver_collect(spark, emb, monkeypatch):
    """The scale tier must never materialize the corpus on the driver:
    with DataFrame.collect poisoned, plan construction AND execution still
    succeed (round-2 verdict item 1 — the broadcast kernel's collect was
    the last driver-bound shape in the pipeline tier)."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from noaa_oracle_spark.pipeline.similarity import (
        embedding_cosine_pairs_blocked,
    )

    def poisoned(self):
        raise AssertionError("driver-side collect in blocked pair path")

    monkeypatch.setattr(CDF, "collect", poisoned)
    out = embedding_cosine_pairs_blocked(emb, threshold=0.4, num_blocks=4)
    assert out.count() == 66  # pinned pair count at sf0.001/threshold 0.4


def test_broadcast_guard_and_strategy_dispatch(spark, emb):
    with pytest.raises(ValueError, match="strategy='blocked'"):
        embedding_cosine_pairs(emb, threshold=0.4, max_broadcast_rows=10)
    via_dispatch = sorted(
        map(
            tuple,
            embedding_cosine_pairs(
                emb, threshold=0.4, strategy="blocked", num_blocks=4
            ).collect(),
        )
    )
    base = sorted(
        map(tuple, embedding_cosine_pairs(emb, threshold=0.4).collect())
    )
    assert via_dispatch == base
    with pytest.raises(ValueError, match="unknown strategy"):
        embedding_cosine_pairs(emb, threshold=0.4, strategy="banana")


def test_numpy_backend_input_validation(spark, emb):
    q = emb.filter(F.col("vec_id") < 3)
    with pytest.raises(ValueError, match="round_digits"):
        brute_force_knn(q, emb, k=3, backend="numpy", round_digits=None)
    str_ids = emb.withColumn("vec_id", F.col("vec_id").cast("string"))
    with pytest.raises(TypeError, match="integral"):
        brute_force_knn(
            str_ids.filter(F.col("vec_id") < 3), str_ids, k=3,
            backend="numpy",
        )
    from noaa_oracle_spark.pipeline.similarity import kmeans_assign

    with pytest.raises(TypeError, match="integral"):
        kmeans_assign(
            emb, str_ids.filter(F.col("vec_id") < 4), backend="numpy"
        )
    with pytest.raises(ValueError, match="collide"):
        kmeans_assign(
            emb.withColumn("cos_sim", F.lit(0.0)),
            emb.filter(F.col("vec_id") < 4),
        )


def test_brute_force_numpy_backend_matches_expr(spark, emb):
    q = emb.filter(F.col("vec_id") < 10)
    expr = sorted(
        (r.q_id, r.rank, r.n_id, r.cos_sim)
        for r in brute_force_knn(q, emb, k=5, backend="expr").collect()
    )
    np_ = sorted(
        (r.q_id, r.rank, r.n_id, r.cos_sim)
        for r in brute_force_knn(q, emb, k=5, backend="numpy").collect()
    )
    assert expr == np_


def test_semantic_dedup_matches_within_cell_oracle(spark, emb):
    """SemDeDup verdicts equal a numpy recomputation: assign via the
    operator's own (tested) kmeans_assign, then flag b iff a lower-id
    SAME-cell member matches at the rounded threshold."""
    from noaa_oracle_spark.pipeline.similarity import (
        kmeans_assign,
        semantic_dedup,
    )

    seeds = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
    got = {
        r.vec_id: (r.cluster_id, r.is_dup, r.dup_of)
        for r in semantic_dedup(emb, seeds, threshold=0.35).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    assert len(got) == len(rows)

    cells = {
        r.vec_id: r.cluster_id
        for r in kmeans_assign(emb.select("vec_id", "embedding"), seeds)
        .select("vec_id", "cluster_id")
        .collect()
    }
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    expected = {}
    for j, b in enumerate(ids):
        owners = [
            int(ids[i])
            for i in range(len(ids))
            if ids[i] < b
            and cells[int(ids[i])] == cells[int(b)]
            and sims[i, j] >= 0.35
        ]
        expected[int(b)] = (
            cells[int(b)],
            bool(owners),
            min(owners) if owners else None,
        )
    assert got == expected
    # the threshold is low enough that the fixture actually plants dups
    assert any(v[1] for v in got.values())


def test_semantic_dedup_planted_exact_duplicate(spark):
    """An identical vector pair always shares a cell and flags the
    higher id with dup_of = the lower."""
    from noaa_oracle_spark.pipeline.similarity import semantic_dedup

    import random

    rnd = random.Random(5)
    base = [[rnd.gauss(0, 1) for _ in range(8)] for _ in range(20)]
    rows = [(i, v) for i, v in enumerate(base)]
    rows.append((100, base[7]))  # exact copy of vec 7
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seeds = df.filter(F.col("vec_id") < 4)
    out = {r.vec_id: r for r in semantic_dedup(df, seeds, 0.999).collect()}
    assert out[100].is_dup and out[100].dup_of == 7
    assert not out[7].is_dup


def test_semantic_dedup_numpy_assignment_matches_expr(spark, emb):
    from noaa_oracle_spark.pipeline.similarity import semantic_dedup

    seeds = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
    expr = sorted(
        map(tuple, semantic_dedup(emb, seeds, threshold=0.35).collect())
    )
    np_ = sorted(
        map(
            tuple,
            semantic_dedup(
                emb, seeds, threshold=0.35, assign_backend="numpy"
            ).collect(),
        )
    )
    assert expr == np_


def test_sq8_compression_and_recall(spark):
    """Int8 scalar quantization: codes live in 0..255, degenerate dims
    survive, and top-5 over the dequantized corpus recalls ≥0.8 of the
    exact float top-5 (4× compression costs little on 64-dim data —
    that's SQ8's pitch vs PQ's 32×)."""
    from noaa_oracle_spark.pipeline.similarity import (
        brute_force_knn,
        sq8_encode,
        sq8_knn,
        sq8_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # plant a degenerate dimension: constant value everywhere
    emb = emb.select(
        "vec_id",
        F.concat(
            F.transform("embedding", lambda x: x.cast("double")),
            F.array(F.lit(4.25)),
        ).alias("embedding"),
    )
    factors = sq8_train(emb)
    frow = {r.dim: r for r in factors.collect()}
    last = max(frow)
    assert frow[last].lo == frow[last].hi == 4.25
    enc = sq8_encode(emb, factors)
    rows = enc.collect()
    assert all(0 <= c <= 255 for r in rows for c in r.codes)
    assert all(r.codes[last] == 0 for r in rows)  # degenerate dim → 0

    q = emb.filter(F.col("vec_id") < 10)
    approx = {
        (r.q_id, r.n_id)
        for r in sq8_knn(q, enc, factors, k=5).collect()
    }
    exact = {
        (r.q_id, r.n_id) for r in brute_force_knn(q, emb, k=5).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.8


def test_sq8_knn_numpy_backend_equals_expr(spark):
    """The numpy dequant+score kernel replicates the expression form's
    per-element arithmetic and dimension-ordered accumulation — results
    must be IDENTICAL including rank order and 6-dp similarities (the
    kmeans_assign/brute_force_knn equality discipline)."""
    from noaa_oracle_spark.pipeline.similarity import (
        sq8_encode,
        sq8_knn,
        sq8_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    factors = sq8_train(emb)
    enc = sq8_encode(emb, factors)
    q = emb.filter(F.col("vec_id") < 10)
    expr_rows = sorted(
        map(tuple, sq8_knn(q, enc, factors, k=5).collect())
    )
    np_rows = sorted(
        map(tuple, sq8_knn(q, enc, factors, k=5, backend="numpy").collect())
    )
    assert expr_rows == np_rows
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sq8_knn(q, enc, factors, k=5, backend="bogus")


def test_sq8_encode_clamps_out_of_range(spark):
    """Encode-new-data-with-frozen-factors (the FAISS SQ8 usage, ADVICE
    r4): vectors outside the trained per-dimension [lo, hi] must clamp to
    the 0..255 code range, not silently overflow the int8 storage claim."""
    from noaa_oracle_spark.pipeline.similarity import sq8_encode, sq8_train

    train = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [1.0, 20.0])], "vec_id long, embedding array<double>"
    )
    factors = sq8_train(train)
    fresh = spark.createDataFrame(
        [(3, [-5.0, 35.0]), (4, [0.5, 15.0])],
        "vec_id long, embedding array<double>",
    )
    codes = {
        r["vec_id"]: r["codes"]
        for r in sq8_encode(fresh, factors).collect()
    }
    assert codes[3] == [0, 255]  # below lo → 0, above hi → 255
    assert all(0 <= c <= 255 for c in codes[4])
