#!/usr/bin/env python3
"""The vector compression ladder measured under ONE protocol
(r5 verdict ask #7): raw float32 → SQ8 int8 → flat PQ/ADC → OPQ →
IVF-PQ → residual IVF-PQ (+ matryoshka prefix rungs), at corpus scale.

Protocol (every tier identical):
  - corpus: N 64-dim vectors (the bench_pipeline embeddings fixture),
    L2-NORMALIZED once and persisted to parquet — cosine and L2 then rank
    identically, so the Euclidean tiers (PQ family) and the cosine tiers
    (raw, SQ8) are judged against the same ground truth.
  - queries: the Q lowest-id vectors; ground truth = exact brute-force
    top-5 (numpy backend), self-matches excluded everywhere.
  - recall@5 = |tier top-5 ∩ exact top-5| / 5, averaged over queries.
  - wall = END-TO-END tier time (train + encode + search, cache cleared
    before each tier): the number a capacity planner actually pays. The
    raw tier has no train/encode — it IS the scan-everything baseline.
  - bytes/vec = the per-vector storage the tier's scan reads.

Knobs: PIPELINE_BENCH_VECS (default 1000000), PIPELINE_BENCH_QUERIES
(100), PIPELINE_BENCH_PQ_K (256 codes/subspace; m is fixed at 8),
PIPELINE_BENCH_CELLS (1024 coarse cells, seeded = lowest-id vectors),
PIPELINE_BENCH_NPROBE (32).

Prints one JSON line; evidence harness for SCALE.md's ladder table, not
a driver contract (bench.py is that).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_VECS = int(os.environ.get("PIPELINE_BENCH_VECS", "1000000"))
N_QUERIES = int(os.environ.get("PIPELINE_BENCH_QUERIES", "100"))
PQ_K = int(os.environ.get("PIPELINE_BENCH_PQ_K", "256"))
N_CELLS = int(os.environ.get("PIPELINE_BENCH_CELLS", "1024"))
NPROBE = int(os.environ.get("PIPELINE_BENCH_NPROBE", "32"))
# PIPELINE_BENCH_GEOMETRY=clustered draws vectors around 1000 seeded
# cluster centers (noise 0.15) instead of reusing the isotropic fixture —
# the corpus shape real model embeddings have, where the PQ/residual
# tiers are supposed to win; the ladder's operational rule (pick tier by
# geometry) needs both sides measured.
GEOMETRY = os.environ.get("PIPELINE_BENCH_GEOMETRY", "isotropic")
N_CLUSTERS = 1000
K = 5
FIXTURE = (
    f"/tmp/noaa_vector_ladder_clustered_{N_VECS}"
    if GEOMETRY == "clustered"
    else f"/tmp/noaa_pipeline_bench_v1_{N_VECS}"
)


def _generate_clustered() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(FIXTURE, "embeddings.parquet")
    if os.path.exists(path):
        return
    os.makedirs(FIXTURE, exist_ok=True)
    rng = np.random.RandomState(7)
    centers = rng.randn(N_CLUSTERS, 64).astype(np.float64)
    assign = rng.randint(0, N_CLUSTERS, N_VECS)
    emb = (
        centers[assign] + 0.15 * rng.randn(N_VECS, 64)
    ).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "cluster_id": pa.array(assign, pa.int32()),
                "embedding": pa.array(
                    emb.tolist(), pa.list_(pa.float32())
                ),
            }
        ),
        path,
    )


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from noaa_oracle_spark.pipeline.pq import (
        ivfpq_knn,
        ivfpq_knn_residual,
        pq_encode,
        pq_knn,
        pq_train,
    )
    from noaa_oracle_spark.pipeline.similarity import (
        brute_force_knn,
        sq8_encode,
        sq8_knn,
        sq8_train,
    )
    from noaa_oracle_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="noaa-vector-ladder")
    spark.sparkContext.setLogLevel("ERROR")

    src = os.path.join(FIXTURE, "embeddings.parquet")
    if GEOMETRY == "clustered":
        _generate_clustered()
    if not os.path.exists(src):
        raise SystemExit(
            f"fixture missing: run bench_pipeline.py once with "
            f"PIPELINE_BENCH_DOCS={N_VECS} to generate {src}"
        )
    norm_path = os.path.join(FIXTURE, "embeddings_l2norm.parquet")
    if not os.path.exists(norm_path):
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        )

        def normalize(batches):
            for pdf in batches:
                x = np.stack(
                    [np.asarray(v, np.float64) for v in pdf["embedding"]]
                )
                x /= np.linalg.norm(x, axis=1, keepdims=True)
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"].to_numpy(), "embedding": list(x)}
                )

        (
            spark.read.parquet(src)
            .mapInPandas(normalize, schema)
            .write.mode("overwrite")
            .parquet(norm_path)
        )
    corpus = spark.read.parquet(norm_path).select("vec_id", "embedding")
    cluster_of = None
    if GEOMETRY == "clustered":
        import pyarrow.parquet as papq

        t = papq.read_table(src, columns=["vec_id", "cluster_id"])
        cluster_of = dict(
            zip(
                t.column("vec_id").to_pylist(),
                t.column("cluster_id").to_pylist(),
            )
        )  # evaluation-only driver map (the tiers never see it)
    queries = corpus.filter(F.col("vec_id") < N_QUERIES)
    cells = corpus.filter(F.col("vec_id") < N_CELLS).select(
        "vec_id", "embedding"
    )

    def top5(df, score_col, ascending):
        """{q_id: [n_id, ...]} from a (q_id, rank, n_id, score) frame."""
        rows = df.collect()
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r["q_id"], []).append((r["rank"], r["n_id"]))
        return {q: [n for _, n in sorted(v)][:K] for q, v in by_q.items()}

    # ground truth (also the raw tier's result set)
    exact = None

    def tier_raw():
        nonlocal exact
        exact = top5(
            brute_force_knn(queries, corpus, k=K, backend="numpy"),
            "cos_sim",
            False,
        )
        return exact

    def tier_sq8():
        factors = sq8_train(corpus)
        enc = sq8_encode(corpus, factors)
        return top5(sq8_knn(queries, enc, factors, k=K), "cos_sim", False)

    books = None  # shared by pq + ivfpq (trained once inside tier_pq)

    def tier_pq():
        nonlocal books
        books = pq_train(corpus, m=8, k=PQ_K, iters=2)
        enc = pq_encode(corpus, books)
        return top5(pq_knn(queries, enc, books, k=K), "adc_dist", True)

    def tier_opq():
        # OPQ rung (the rotation pq.save_pq_index persists, r11):
        # eigenvalue-balanced rotation (Ge et al. CVPR 2013) BEFORE the
        # same m=8 / PQ_K / iters=2 quantizer — recall is judged against
        # the SAME raw-space exact top-5 (the rotation is orthogonal, so
        # exact cosine ranking is invariant; the tier measures only how
        # much ADC distortion the rotation removes).  Its gain over the
        # pq tier is data-dependent: ~0 on isotropic embeddings, real
        # under anisotropy/clustered geometry — record both regimes.
        from noaa_oracle_spark.pipeline.pq import (
            opq_train_rotation,
            rotate_embeddings,
        )

        rot = opq_train_rotation(corpus, m=8)
        rcorpus = rotate_embeddings(corpus, rot)
        rqueries = rotate_embeddings(queries, rot)
        obooks = pq_train(rcorpus, m=8, k=PQ_K, iters=2)
        enc = pq_encode(rcorpus, obooks)
        return top5(
            pq_knn(rqueries, enc, obooks, k=K), "adc_dist", True
        )

    # PIPELINE_BENCH_IVFPQ_PLAN picks the probe plan for the ivfpq tiers
    # (inline = scan-stage fused kernel, the r9 default; shuffle /
    # broadcast = the join shapes) — the r9 plan-ladder evidence knob.
    ivfpq_plan = os.environ.get("PIPELINE_BENCH_IVFPQ_PLAN", "inline")

    def tier_ivfpq():
        # books reused from the pq tier: the FAISS composition shares the
        # flat codebooks (q101's form); timing therefore EXCLUDES codebook
        # training and measures routing + encode + probed ADC
        return top5(
            ivfpq_knn(
                queries,
                corpus,
                books,
                cells,
                k=K,
                nprobe=NPROBE,
                plan=ivfpq_plan,
            ),
            "adc_dist",
            True,
        )

    def tier_residual():
        return top5(
            ivfpq_knn_residual(
                queries,
                corpus,
                cells,
                m=8,
                k_codes=PQ_K,
                iters=2,  # same Lloyd budget as the pq tier's codebooks
                k=K,
                nprobe=NPROBE,
                plan=ivfpq_plan,
            ),
            "adc_dist",
            True,
        )

    # Matryoshka prefix-truncation tiers (q125): no training at all —
    # the "compression" is reading only the head dims. On embeddings NOT
    # trained with the matryoshka loss (both fixtures here) truncation
    # discards information uniformly, so these rungs measure the
    # geometry floor an MRL-trained model would lift — the honest
    # negative control beside SQ8 at the same 64 B/vec.
    from noaa_oracle_spark.pipeline.similarity import matryoshka_knn

    def tier_mrl(d_prefix):
        return top5(
            matryoshka_knn(
                queries, corpus, d_prefix=d_prefix, k=K, backend="numpy"
            ).withColumnRenamed("cos_prefix", "cos_sim"),
            "cos_sim",
            False,
        )

    bytes_per_vec = {
        "raw": 64 * 4,
        "mrl16": 16 * 4,
        "mrl32": 32 * 4,
        "sq8": 64,
        "pq": 8,
        "opq": 8,
        "ivfpq": 8,
        "residual_ivfpq": 8,
    }
    # PIPELINE_BENCH_TIERS=mrl16,mrl32 reruns a subset against fresh
    # ground truth (raw ALWAYS runs — it defines `exact`); recall values
    # are tier-independent, so subset runs splice into the full table
    tiers_only = {
        s for s in os.environ.get("PIPELINE_BENCH_TIERS", "").split(",") if s
    }
    out: dict = {}
    for name, fn in [
        ("raw", tier_raw),
        ("mrl16", lambda: tier_mrl(16)),
        ("mrl32", lambda: tier_mrl(32)),
        ("sq8", tier_sq8),
        ("pq", tier_pq),
        ("opq", tier_opq),
        ("ivfpq", tier_ivfpq),
        ("residual_ivfpq", tier_residual),
    ]:
        if tiers_only and name != "raw" and name not in tiers_only:
            continue
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        got = fn()
        wall = time.perf_counter() - t0
        recall = sum(
            len(set(got.get(q, [])) & set(exact[q])) / K for q in exact
        ) / len(exact)
        out[name] = {
            "sec": round(wall, 2),
            "recall_at_5": round(recall, 4),
            "bytes_per_vec": bytes_per_vec[name],
        }
        if cluster_of is not None:
            # clustered regime: recall-vs-exact is tie-dominated (every
            # same-cluster member shares a code, so ADC top-5 among ties
            # is id-order — the test_pq metric-design note); the honest
            # quality signal is cluster retrieval
            hit = sum(
                sum(
                    1
                    for n in got.get(q, [])
                    if cluster_of.get(n) == cluster_of.get(q)
                )
                / max(len(got.get(q, [])), 1)
                for q in exact
            ) / len(exact)
            out[name]["cluster_hit_at_5"] = round(hit, 4)
    print(
        json.dumps(
            {
                "metric": "vector_ladder",
                "geometry": GEOMETRY,
                "n_vecs": N_VECS,
                "n_queries": N_QUERIES,
                "pq_k": PQ_K,
                "cells": N_CELLS,
                "nprobe": NPROBE,
                "ivfpq_plan": ivfpq_plan,
                "tiers": out,
            }
        )
    )


if __name__ == "__main__":
    main()
