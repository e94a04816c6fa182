#!/usr/bin/env python3
"""Index-maintenance rung harness: the warm-protocol measurements behind
SCALE.md's append/rebuild numbers for the retrieval tier — BM25
(`append_bm25_index` vs full `save_bm25_index`) and PQ
(`append_pq_index` vs full re-encode), at PIPELINE_BENCH_DOCS scale.

Protocol (the lesson §13 records): a COLD first build reads ~3.6× its
warm self (JVM JIT + page cache), so each tier runs one throwaway warm
build before anything is timed, and all reported stages are warm.
Equality is asserted in-run: the grown index must serve scores
identical to the rebuild.

Knobs: PIPELINE_BENCH_DOCS (default 1000000; the bench_pipeline fixture
is generated on demand), BENCH_APPEND_FRACTION (default 0.1 — the shard
appended, the rest is the base index).

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
# bench_pipeline's own default is 100k — pin the shared knob BEFORE the
# import so the fixture module generates at THIS harness's scale (the
# first 1M run silently got the 100k fixture, an empty append shard,
# and a failed row-count assert — the assert is why it was caught)
os.environ["PIPELINE_BENCH_DOCS"] = str(N_DOCS)


def main() -> None:
    import bench_pipeline  # fixture recipe (documents + embeddings)

    src_docs = bench_pipeline._generate()
    src_emb = os.path.join(os.path.dirname(src_docs), "embeddings.parquet")

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

    # ---- BM25 tier -------------------------------------------------
    docs = spark.read.parquet(src_docs).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < cut)
    extra = docs.filter(F.col("doc_id") >= cut)
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
    terms = ["w3", "w17", "w101"]
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

    # ---- PQ tier ---------------------------------------------------
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
    assert load_pq_index(spark, p("pq_base"))["manifest"].n_encoded == N_DOCS
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


if __name__ == "__main__":
    main()
