#!/usr/bin/env python3
"""Index-maintenance rung harness: the warm-protocol measurements behind
SCALE.md's append/rebuild/compaction/serving numbers for the retrieval
tier, at PIPELINE_BENCH_DOCS scale.

Protocol (the lesson §13 records): a COLD first build reads ~3.6× its
warm self (JVM JIT + page cache), so each tier runs one throwaway warm
pass before anything is timed, and all reported stages are warm.
Equality is asserted in-run: a grown or compacted index must serve
scores identical to its rebuilt/fragmented twin.

Tiers (BENCH_TIERS, comma list, default
"bm25,pq,compaction,pq_compaction,hybrid,hybrid_batch"):
  bm25 / pq     — append vs rebuild cost (r9 rungs)
  compaction    — BM25 read amplification after ~20 small appends vs
                  after `compact_bm25_index` (r9 verdict ask #3)
  pq_compaction — the vector twin (r10 verdict ask #2): IVF-PQ cell-dir
                  file growth after ~20 appends, fragmented vs
                  compacted nprobe-pruned serve latency
  hybrid        — one /search/hybrid-shaped request at scale: BM25 leg,
                  nprobe-pruned vector leg, and their RRF fusion, each
                  warm min-of-2 (r9 verdict ask #5)
  hybrid_batch  — 32 hybrid queries as ONE batch (bm25_query_batch +
                  ivfpq_query_batch + rrf_fuse_batch) vs 32 sequential
                  single hybrids (r10 verdict ask #4)
  pq_sink       — the production versioned-root ingest loop (r12):
                  per-microbatch cost with auto-compaction + drift on
  pq_retrain    — offline retrain of a sink-grown versioned root (r12):
                  the drift signal's closing action vs its init cost

Knobs: PIPELINE_BENCH_DOCS (default 1000000; the bench_pipeline fixture
is generated on demand), BENCH_APPEND_FRACTION (default 0.1 — the shard
appended, the rest is the base index), BENCH_N_APPENDS (default 20,
compaction tier).

Prints one JSON line per tier.  Evidence harness for SCALE.md, not a
driver contract (bench.py is that).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS = int(os.environ.get("PIPELINE_BENCH_DOCS", "1000000"))
FRACTION = float(os.environ.get("BENCH_APPEND_FRACTION", "0.1"))
N_APPENDS = int(os.environ.get("BENCH_N_APPENDS", "20"))
TIERS = set(
    os.environ.get(
        "BENCH_TIERS",
        "bm25,pq,compaction,pq_compaction,hybrid,hybrid_batch",
    ).split(",")
)
# bench_pipeline's own default is 100k — pin the shared knob BEFORE the
# import so the fixture module generates at THIS harness's scale (the
# first 1M run silently got the 100k fixture, an empty append shard,
# and a failed row-count assert — the assert is why it was caught)
os.environ["PIPELINE_BENCH_DOCS"] = str(N_DOCS)


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def warm_min2(fn) -> float:
    """One throwaway warm pass, then min of two timed runs."""
    fn()
    return min(_timed(fn), _timed(fn))


def main() -> None:
    import bench_pipeline  # fixture recipe (documents + embeddings)

    src_docs = bench_pipeline._generate()
    src_emb = os.path.join(os.path.dirname(src_docs), "embeddings.parquet")

    from pyspark.sql import functions as F

    from noaa_oracle_spark.pipeline.pq import (
        append_pq_index,
        ivfpq_query,
        load_pq_index,
        pq_encode,
        pq_train,
        save_ivfpq_index,
        save_pq_index,
    )
    from noaa_oracle_spark.pipeline.text import (
        _parquet_file_count,
        append_bm25_index,
        bm25_query,
        compact_bm25_index,
        load_bm25_index,
        rrf_fuse,
        save_bm25_index,
    )
    from noaa_oracle_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="index-maintenance-rung")
    spark.sparkContext.setLogLevel("ERROR")
    cut = int(N_DOCS * (1.0 - FRACTION))
    work = "/tmp/noaa_index_maint_rung"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    def p(name: str) -> str:
        return os.path.join(work, name)

    docs = spark.read.parquet(src_docs).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < cut)
    extra = docs.filter(F.col("doc_id") >= cut)
    terms = ["w3", "w17", "w101"]

    # ---- BM25 append-vs-rebuild tier -------------------------------
    if "bm25" in TIERS:
        save_bm25_index(base, p("bm_warm"))  # throwaway warm pass
        t = time.time()
        save_bm25_index(base, p("bm_base"))
        t_base = time.time() - t
        t = time.time()
        n = append_bm25_index(spark, p("bm_base"), extra)
        t_append = time.time() - t
        assert n == N_DOCS - cut, n
        t = time.time()
        save_bm25_index(docs, p("bm_full"))
        t_rebuild = time.time() - t
        g = load_bm25_index(spark, p("bm_base"))
        f = load_bm25_index(spark, p("bm_full"))
        assert (g["manifest"].n_docs, g["manifest"].n_postings) == (
            f["manifest"].n_docs,
            f["manifest"].n_postings,
        )
        assert [tuple(r) for r in bm25_query(g, terms, k=10).collect()] == [
            tuple(r) for r in bm25_query(f, terms, k=10).collect()
        ]
        print(
            json.dumps(
                {
                    "tier": "bm25",
                    "n_docs": N_DOCS,
                    "warm_base_build_s": round(t_base, 1),
                    "append_s": round(t_append, 1),
                    "rebuild_s": round(t_rebuild, 1),
                    "append_vs_rebuild": round(t_rebuild / t_append, 2),
                    "grown_equals_full": True,
                }
            ),
            flush=True,
        )

    # ---- PQ append-vs-rebuild tier ---------------------------------
    if "pq" in TIERS:
        emb = spark.read.parquet(src_emb)
        ebase = emb.filter(F.col("vec_id") < cut)
        eextra = emb.filter(F.col("vec_id") >= cut)
        books = pq_train(ebase, m=8, k=256, iters=2)  # excluded from timings
        save_pq_index(books, pq_encode(ebase, books), p("pq_warm"))
        t = time.time()
        save_pq_index(books, pq_encode(ebase, books), p("pq_base"))
        t_base = time.time() - t
        t = time.time()
        n = append_pq_index(spark, p("pq_base"), eextra)
        t_append = time.time() - t
        assert n == N_DOCS - cut, n
        t = time.time()
        save_pq_index(books, pq_encode(emb, books), p("pq_full"))
        t_rebuild = time.time() - t
        assert (
            load_pq_index(spark, p("pq_base"))["manifest"].n_encoded == N_DOCS
        )
        print(
            json.dumps(
                {
                    "tier": "pq",
                    "n_vecs": N_DOCS,
                    "warm_base_build_s": round(t_base, 1),
                    "append_s": round(t_append, 1),
                    "rebuild_s": round(t_rebuild, 1),
                    "append_vs_rebuild": round(t_rebuild / t_append, 2),
                }
            ),
            flush=True,
        )

    # ---- BM25 compaction tier --------------------------------------
    # Degradation this measures: append_bm25_index is file-level, so
    # after N small appends each term's postings spread across ~N file
    # sets and the query-term filter opens every one (footer pruning
    # degrades — each appended file spans its batch's whole vocabulary).
    if "compaction" in TIERS:
        frag = p("bm_frag")
        shard_n = max(1, (N_DOCS - cut) // N_APPENDS)
        save_bm25_index(base, frag)
        files_fresh = _parquet_file_count(spark, f"{frag}/postings")
        t = time.time()
        appended = 0
        append_series = []
        for i in range(N_APPENDS):
            lo = cut + i * shard_n
            hi = N_DOCS if i == N_APPENDS - 1 else lo + shard_n
            t1 = time.time()
            appended += append_bm25_index(
                spark,
                frag,
                docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            )
            append_series.append(round(time.time() - t1, 2))
        t_appends = time.time() - t
        assert appended == N_DOCS - cut, appended
        files_frag = _parquet_file_count(spark, f"{frag}/postings")

        fidx = load_bm25_index(spark, frag)
        t_q_frag = warm_min2(
            lambda: bm25_query(fidx, terms, k=10).collect()
        )
        t = time.time()
        stats = compact_bm25_index(spark, frag, p("bm_compacted"))
        t_compact = time.time() - t
        cidx = load_bm25_index(spark, p("bm_compacted"))
        t_q_comp = warm_min2(
            lambda: bm25_query(cidx, terms, k=10).collect()
        )
        assert [tuple(r) for r in bm25_query(cidx, terms, k=10).collect()] == [
            tuple(r) for r in bm25_query(fidx, terms, k=10).collect()
        ]
        print(
            json.dumps(
                {
                    "tier": "bm25_compaction",
                    "n_docs": N_DOCS,
                    "n_appends": N_APPENDS,
                    "appends_total_s": round(t_appends, 1),
                    "append_series_s": append_series,
                    "postings_files_fresh": files_fresh,
                    "postings_files_fragmented": files_frag,
                    "postings_files_compacted": stats[
                        "postings_files_after"
                    ],
                    "read_amplification": round(
                        files_frag / max(1, files_fresh), 2
                    ),
                    "query_fragmented_s": round(t_q_frag, 2),
                    "query_compacted_s": round(t_q_comp, 2),
                    "query_speedup": round(t_q_frag / t_q_comp, 2),
                    "compact_s": round(t_compact, 1),
                    "compacted_equals_fragmented": True,
                }
            ),
            flush=True,
        )

    # ---- PQ/IVF-PQ compaction tier ---------------------------------
    # The BM25 tier's vector twin (r10 verdict ask #2): append_pq_index
    # lands each append's files INSIDE the cluster_id= directories, so
    # after N small appends every probed cell opens ~N file sets.
    # compact_pq_index rewrites to one file set per cell; neighbors are
    # bit-identical (the codes row set is unchanged).
    if "pq_compaction" in TIERS:
        from noaa_oracle_spark.pipeline.pq import compact_pq_index

        emb = spark.read.parquet(src_emb)
        ebase = emb.filter(F.col("vec_id") < cut)
        n_cells = 1024
        cells = emb.filter(F.col("vec_id") < n_cells)
        cbooks = pq_train(ebase, m=8, k=256, iters=0)
        pfrag = p("pq_frag")
        save_ivfpq_index(cbooks, ebase, cells, pfrag)
        files_fresh = _parquet_file_count(spark, f"{pfrag}/codes")
        shard_n = max(1, (N_DOCS - cut) // N_APPENDS)
        t = time.time()
        appended = 0
        append_series = []
        for i in range(N_APPENDS):
            lo = cut + i * shard_n
            hi = N_DOCS if i == N_APPENDS - 1 else lo + shard_n
            t1 = time.time()
            appended += append_pq_index(
                spark,
                pfrag,
                emb.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                ),
            )
            append_series.append(round(time.time() - t1, 2))
        t_appends = time.time() - t
        assert appended == N_DOCS - cut, appended
        files_frag = _parquet_file_count(spark, f"{pfrag}/codes")

        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
        ]
        fidx = load_pq_index(spark, pfrag)
        t_q_frag = warm_min2(
            lambda: ivfpq_query(fidx, qvec, k=10, nprobe=32).collect()
        )
        t = time.time()
        stats = compact_pq_index(spark, pfrag, p("pq_compacted"))
        t_compact = time.time() - t
        cidx = load_pq_index(spark, p("pq_compacted"))
        t_q_comp = warm_min2(
            lambda: ivfpq_query(cidx, qvec, k=10, nprobe=32).collect()
        )
        assert [
            tuple(r)
            for r in ivfpq_query(cidx, qvec, k=10, nprobe=32)
            .orderBy("rank")
            .collect()
        ] == [
            tuple(r)
            for r in ivfpq_query(fidx, qvec, k=10, nprobe=32)
            .orderBy("rank")
            .collect()
        ]
        print(
            json.dumps(
                {
                    "tier": "pq_compaction",
                    "n_vecs": N_DOCS,
                    "n_appends": N_APPENDS,
                    "nprobe": 32,
                    "appends_total_s": round(t_appends, 1),
                    # per-append series: flat == validation is O(new
                    # shard); growth would mean an O(index) term crept
                    # back in (r11 verdict ask #2's done-criterion)
                    "append_series_s": append_series,
                    "compact_timings": stats["timings"],
                    "codes_files_fresh": files_fresh,
                    "codes_files_fragmented": files_frag,
                    "codes_files_compacted": stats["codes_files_after"],
                    "read_amplification": round(
                        files_frag / max(1, files_fresh), 2
                    ),
                    "query_fragmented_s": round(t_q_frag, 2),
                    "query_compacted_s": round(t_q_comp, 2),
                    "query_speedup": round(t_q_frag / t_q_comp, 2),
                    "compact_s": round(t_compact, 1),
                    "compacted_equals_fragmented": True,
                }
            ),
            flush=True,
        )

    # ---- PQ streaming-sink tier (r12) --------------------------------
    # The PRODUCTION ingest loop at scale: a bootstrapped versioned
    # IVF-PQ root grows by one pq_index_sink batch per 50k shard, with
    # auto-compaction and the codebook-drift metric on.  Per-batch cost
    # = containment check + validated load + encode-append + drift row
    # + fragmentation poll — the number an operator actually pays per
    # microbatch (the bare-append tier above excludes the sink's
    # replay/validation discipline).
    if "pq_sink" in TIERS:
        from noaa_oracle_spark.streaming.corpus import (
            current_pq_index_path,
            init_versioned_pq_index,
            pq_index_sink,
            read_drift_metrics,
        )

        emb = spark.read.parquet(src_emb)
        ebase = emb.filter(F.col("vec_id") < cut)
        n_cells = 1024
        cells = emb.filter(F.col("vec_id") < n_cells)
        sbooks = pq_train(ebase, m=8, k=256, iters=0)
        sroot = p("pq_sink_root")
        t = time.time()
        init_versioned_pq_index(spark, sroot, sbooks, ebase, cells=cells)
        t_init = time.time() - t
        sink = pq_index_sink(sroot, auto_compact_ratio=3.0)
        shard_n = max(1, (N_DOCS - cut) // N_APPENDS)
        batch_series = []
        for i in range(N_APPENDS):
            lo = cut + i * shard_n
            hi = N_DOCS if i == N_APPENDS - 1 else lo + shard_n
            t1 = time.time()
            sink(
                emb.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                ),
                i,
            )
            batch_series.append(round(time.time() - t1, 2))
        ver = current_pq_index_path(spark, sroot)
        drift = read_drift_metrics(spark, ver)
        sidx = load_pq_index(spark, ver)
        assert int(sidx["manifest"].n_encoded) == N_DOCS
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
        ]
        t_q = warm_min2(
            lambda: ivfpq_query(sidx, qvec, k=10, nprobe=32).collect()
        )
        mses = [round(float(r.mse), 4) for r in drift]
        print(
            json.dumps(
                {
                    "tier": "pq_sink",
                    "n_vecs": N_DOCS,
                    "n_batches": N_APPENDS,
                    "init_s": round(t_init, 1),
                    "batch_series_s": batch_series,
                    "batch_avg_s": round(
                        sum(batch_series) / len(batch_series), 2
                    ),
                    "drift_mse_series": mses,
                    "drift_flat": bool(
                        max(mses) / max(min(mses), 1e-12) < 1.5
                    ),
                    "compacted": not ver.endswith("v00000000"),
                    "serve_s": round(t_q, 2),
                }
            ),
            flush=True,
        )

    # ---- PQ offline-retrain tier (r12) -------------------------------
    # The drift signal's closing action at scale: a versioned root whose
    # codebooks were frozen at init retrains on the full source-of-truth
    # corpus (`retrain_pq_index` — fresh books + cells, new version,
    # atomic repoint).  The claim under test: retrain ≈ init cost (train
    # + encode + celled save, all distributed) and everything around it
    # (repoint, serving continuity) is O(pointer).
    if "pq_retrain" in TIERS:
        from noaa_oracle_spark.streaming.corpus import (
            current_pq_index_path,
            init_versioned_pq_index,
            pq_index_sink,
            read_current_bm25_version,
            retrain_pq_index,
        )

        emb = spark.read.parquet(src_emb)
        ebase = emb.filter(F.col("vec_id") < cut)
        cells = emb.filter(F.col("vec_id") < 1024)
        rbooks = pq_train(ebase, m=8, k=256, iters=0)
        rroot = p("pq_retrain_root")
        t = time.time()
        init_versioned_pq_index(spark, rroot, rbooks, ebase, cells=cells)
        t_init = time.time() - t
        # grow the root through the production sink (4 × ~25k batches)
        sink = pq_index_sink(rroot)
        shard_n = max(1, (N_DOCS - cut) // 4)
        for i in range(4):
            lo = cut + i * shard_n
            hi = N_DOCS if i == 3 else lo + shard_n
            sink(
                emb.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                ),
                i,
            )
        old_ver = read_current_bm25_version(spark, rroot)
        t = time.time()
        new_path = retrain_pq_index(spark, rroot, emb, iters=0)
        t_retrain = time.time() - t
        assert read_current_bm25_version(spark, rroot) != old_ver
        ridx = load_pq_index(spark, new_path)
        assert int(ridx["manifest"].n_encoded) == N_DOCS
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
        ]
        t_q = warm_min2(
            lambda: ivfpq_query(ridx, qvec, k=10, nprobe=32).collect()
        )
        print(
            json.dumps(
                {
                    "tier": "pq_retrain",
                    "n_vecs": N_DOCS,
                    "init_s": round(t_init, 1),
                    "retrain_s": round(t_retrain, 1),
                    "retrain_over_init": round(t_retrain / t_init, 2),
                    "version": current_pq_index_path(
                        spark, rroot
                    ).rsplit("/", 1)[-1],
                    "serve_s": round(t_q, 2),
                }
            ),
            flush=True,
        )

    # ---- hybrid-serve tier -----------------------------------------
    # One /search/hybrid request at scale: both legs warm min-of-2,
    # then the fused request.  Expectation: hybrid ≈ legs' sum (the
    # fusion is bounded top-k work); a corpus-shaped extra term here
    # would be a serving regression.
    if "hybrid" in TIERS:
        emb = spark.read.parquet(src_emb)
        n_cells = 1024
        cells = emb.filter(F.col("vec_id") < n_cells)
        # iters=0 (seeded codebooks): quantization QUALITY is not under
        # test here — serve latency depends on index geometry only
        hbooks = pq_train(emb, m=8, k=256, iters=0)
        t = time.time()
        save_ivfpq_index(hbooks, emb, cells, p("hy_ivfpq"))
        t_build_vec = time.time() - t
        if "bm25" in TIERS:
            bm_path = p("bm_full")
        else:
            bm_path = p("hy_bm25")
            save_bm25_index(docs, bm_path)
        bidx = load_bm25_index(spark, bm_path)
        vidx = load_pq_index(spark, p("hy_ivfpq"))
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
        ]

        t_lex = warm_min2(lambda: bm25_query(bidx, terms, k=20).collect())
        t_vec = warm_min2(
            lambda: ivfpq_query(vidx, qvec, k=20, nprobe=32).collect()
        )

        def hybrid():
            lex = bm25_query(bidx, terms, k=20).select("doc_id", "rnk")
            vec = ivfpq_query(vidx, qvec, k=20, nprobe=32).select(
                F.col("n_id").alias("doc_id"), F.col("rank").alias("rnk")
            )
            return rrf_fuse([lex, vec], k=60, topk=10).collect()

        t_hybrid = warm_min2(hybrid)
        fused = hybrid()
        assert len(fused) == 10, len(fused)
        print(
            json.dumps(
                {
                    "tier": "hybrid_serve",
                    "n_docs": N_DOCS,
                    "nprobe": 32,
                    "vec_index_build_s": round(t_build_vec, 1),
                    "bm25_leg_s": round(t_lex, 2),
                    "vector_leg_s": round(t_vec, 2),
                    "hybrid_s": round(t_hybrid, 2),
                    "hybrid_vs_legs_sum": round(
                        t_hybrid / (t_lex + t_vec), 2
                    ),
                }
            ),
            flush=True,
        )

    # ---- batch-hybrid tier -----------------------------------------
    # 32 hybrid queries as ONE batch (the r10 ask #4 shape: one
    # multi-query BM25 pass + one partition-pruned ivfpq_query_batch +
    # per-query RRF) vs 32 sequential single hybrids.  Expectation: the
    # knn leg's measured 3.2× batch gain carries over; flag if the BM25
    # leg serializes.
    if "hybrid_batch" in TIERS:
        from noaa_oracle_spark.pipeline.pq import ivfpq_query_batch
        from noaa_oracle_spark.pipeline.text import (
            bm25_query_batch,
            rrf_fuse_batch,
        )

        emb = spark.read.parquet(src_emb)
        if "hybrid" not in TIERS:
            n_cells = 1024
            cells = emb.filter(F.col("vec_id") < n_cells)
            hbooks = pq_train(emb, m=8, k=256, iters=0)
            save_ivfpq_index(hbooks, emb, cells, p("hy_ivfpq"))
        bm_path = p("bm_full") if "bm25" in TIERS else p("hy_bm25")
        if not os.path.exists(os.path.join(bm_path, "manifest")):
            save_bm25_index(docs, bm_path)
        bidx = load_bm25_index(spark, bm_path)
        vidx = load_pq_index(spark, p("hy_ivfpq"))
        n_batch = 32
        qvecs = [
            [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id") < n_batch)
            .orderBy("vec_id")
            .collect()
        ]
        term_pool = [f"w{i}" for i in range(1, 200, 3)]
        qterms = [
            [term_pool[(3 * i) % len(term_pool)],
             term_pool[(3 * i + 1) % len(term_pool)],
             term_pool[(3 * i + 2) % len(term_pool)]]
            for i in range(n_batch)
        ]

        def one_hybrid(i: int):
            lex = bm25_query(bidx, qterms[i], k=20).select(
                "doc_id", "rnk"
            )
            vec = ivfpq_query(vidx, qvecs[i], k=20, nprobe=32).select(
                F.col("n_id").alias("doc_id"), F.col("rank").alias("rnk")
            )
            return rrf_fuse([lex, vec], k=60, topk=10).collect()

        def sequential():
            return [one_hybrid(i) for i in range(n_batch)]

        def batched():
            lex = bm25_query_batch(bidx, qterms, k=20).select(
                "q_idx", "doc_id", "rnk"
            )
            vec = ivfpq_query_batch(
                vidx, qvecs, k=20, nprobe=32
            ).select(
                "q_idx",
                F.col("n_id").alias("doc_id"),
                F.col("rank").alias("rnk"),
            )
            return rrf_fuse_batch([lex, vec], k=60, topk=10).collect()

        t_seq = warm_min2(sequential)
        t_batch = warm_min2(batched)
        # per-query equality: the batch IS the N singles
        got: dict = {}
        for r in batched():
            got.setdefault(r.q_idx, []).append(
                (r.rnk, r.doc_id, r.rrf_score)
            )
        for i, single in enumerate(sequential()):
            want = [(r.rnk, r.doc_id, r.rrf_score) for r in single]
            assert sorted(got[i]) == sorted(want), i
        print(
            json.dumps(
                {
                    "tier": "hybrid_batch",
                    "n_docs": N_DOCS,
                    "n_queries": n_batch,
                    "nprobe": 32,
                    "sequential_s": round(t_seq, 2),
                    "batch_s": round(t_batch, 2),
                    "batch_speedup": round(t_seq / t_batch, 2),
                    "batch_equals_singles": True,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
