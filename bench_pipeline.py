#!/usr/bin/env python3
"""Training-pipeline operators at corpus scale (beyond the driver's sf0.1
documents table, which has only 5 k docs).

Generates a synthetic corpus with planted structure — exact duplicates,
near-duplicates (word-perturbed copies), and a hot boilerplate sentence
shared by a fifth of the corpus (the Zipf/hot-shingle shape that kills
naive inverted-index joins) — and times the dedup ladder end-to-end:

    exact      md5 groupBy
    minhash    MinHash+LSH banding candidates (count)
    jaccard    exact inverted-index pair join (count)
    ppjoin     prefix-filtered exact pair join (count) — the scale path
    components connected components over the ppjoin pair graph
    repetition Gopher repetition prefilter
    winnowing  MOSS fingerprints (count)
    span_dedup / weighted_sample / kmeans_{assign,assign_numpy,update}
    exact_substring           char-level duplicated-span removal
    semantic_dedup[_numpy]    SemDeDup cells + within-cell verify
    decon_{shuffle,bloom,grams_*}  decontamination tiers + shuffle volume
    emb_pairs_{broadcast,blocked,beyond_broadcast}  exact pair strategies
    pq_train_encode_search    PQ codebooks + encode + ADC top-k
    components_chain_{star,propagate}  round-count stress topology

Prints one JSON line. Not part of the driver's bench contract (bench.py is
that); this is the evidence harness behind SCALE.md's claims.

    PIPELINE_BENCH_DOCS=100000 python bench_pipeline.py
    PIPELINE_BENCH_ZIPF=1 PIPELINE_BENCH_ONLY=exact,minhash,ppjoin \\
        PIPELINE_BENCH_DOCS=1000000 python bench_pipeline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS = int(os.environ.get("PIPELINE_BENCH_DOCS", "100000"))
# PIPELINE_BENCH_ZIPF=1: draw words from a Zipf(1.2) distribution instead
# of uniform — the realistic web-corpus shingle skew (a few shingles occur
# everywhere), which is precisely what PPJoin's prefix filtering is for
# and what breaks the plain inverted-index join.
ZIPF = os.environ.get("PIPELINE_BENCH_ZIPF", "") == "1"
FIXTURE = f"/tmp/noaa_pipeline_bench_v1_{N_DOCS}" + ("_zipf" if ZIPF else "")
VOCAB = 5000
SEED = 42


def _draw_words(rng, n: int) -> "np.ndarray":
    if ZIPF:
        idx = rng.zipf(1.2, size=n) % VOCAB
        return idx
    return rng.randint(0, VOCAB, n)


def _generate() -> str:
    path = os.path.join(FIXTURE, "documents.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(FIXTURE, exist_ok=True)
    rng = np.random.RandomState(SEED)
    vocab = np.array([f"w{i}" for i in range(VOCAB)])
    boiler = " ".join(vocab[rng.randint(0, VOCAB, 12)])

    texts: list[str] = []
    n_base = int(N_DOCS * 0.85)
    for _ in range(n_base):
        ln = rng.randint(40, 200)
        words = vocab[_draw_words(rng, ln)]
        t = " ".join(words)
        if rng.rand() < 0.2:  # hot boilerplate in 20% of docs
            t = boiler + " " + t
        texts.append(t)
    # 10% near-duplicates: perturb ~3 words of a random base doc
    for _ in range(int(N_DOCS * 0.10)):
        src = texts[rng.randint(0, n_base)].split(" ")
        for _ in range(3):
            src[rng.randint(0, len(src))] = vocab[rng.randint(0, VOCAB)]
        texts.append(" ".join(src))
    # 5% exact duplicates
    while len(texts) < N_DOCS:
        texts.append(texts[rng.randint(0, n_base)])

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
        }
    )
    pq.write_table(tbl, path)

    # embeddings for the vector rungs: N_DOCS x 64 float32, deterministic
    emb = np.random.RandomState(SEED + 1).randn(N_DOCS, 64).astype(np.float32)
    etbl = pa.table(
        {
            "vec_id": pa.array(range(N_DOCS), pa.int64()),
            "embedding": pa.array(emb.tolist(), pa.list_(pa.float32())),
        }
    )
    pq.write_table(etbl, os.path.join(FIXTURE, "embeddings.parquet"))
    return path


def main() -> None:
    from noaa_oracle_spark.pipeline.dedup import (
        connected_components,
        exact_dedup,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_ppjoin,
    )
    from noaa_oracle_spark.pipeline.text import (
        repetition_stats,
        winnowing_fingerprints,
    )
    from noaa_oracle_spark.session import get_spark

    path = _generate()
    # The engine default heap (8g) models a SMALL executor; the 1M-doc
    # rungs move ~770M slim gram rows through hash aggregation, which on
    # a real cluster would run against spark.executor.memory sized by
    # the §5 recipe (SCALE.md), not 8g shared by 32 threads. Size the
    # single local JVM accordingly — override with SPARK_GRAFT_DRIVER_MEM.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="noaa-pipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(path)

    out: dict[str, dict] = {}
    # PIPELINE_BENCH_ONLY=exact,minhash,ppjoin restricts to named rungs
    # (the 1M Zipf ladder skips the deliberately-naive jaccard rung, which
    # is quadratic-ish in hot shingles by design)
    only = {
        s for s in os.environ.get("PIPELINE_BENCH_ONLY", "").split(",") if s
    }

    def run(name, fn):
        if only and name not in only:
            return
        # each rung stands alone: operators persist their shared stages and
        # a long-lived service would evict them naturally, but letting one
        # rung's leftover cache evict under the next rung's memory pressure
        # would time GC churn, not the operator
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = fn()
        out[name] = {"sec": round(time.perf_counter() - t0, 2), "rows": n}

    run("exact", lambda: exact_dedup(docs).count())
    run("minhash", lambda: minhash_lsh_candidates(
        docs, num_hashes=8, rows_per_band=2).count())
    run("jaccard", lambda: ngram_jaccard_pairs(
        docs, threshold_num=8, threshold_den=10).count())
    run("ppjoin", lambda: ngram_jaccard_pairs_ppjoin(
        docs, threshold_num=8, threshold_den=10).count())
    run("components", lambda: connected_components(
        docs,
        ngram_jaccard_pairs_ppjoin(
            docs, threshold_num=8, threshold_den=10
        ).select("doc_a", "doc_b"),
    ).count())
    # the same graph forced onto the distributed two-phase star path
    # (the >1M-edge tier), bypassing the driver union-find shortcut —
    # the q38 corpus-scale evidence for the algorithm a cluster would run
    run("components_star", lambda: connected_components(
        docs,
        ngram_jaccard_pairs_ppjoin(
            docs, threshold_num=8, threshold_den=10
        ).select("doc_a", "doc_b"),
        driver_edge_threshold=0,
        algorithm="star",
    ).count())
    run("repetition", lambda: repetition_stats(docs).count())
    run("winnowing", lambda: winnowing_fingerprints(
        docs, k=8, window=4).count())

    from noaa_oracle_spark.pipeline.sampling import weighted_hash_sample
    from noaa_oracle_spark.pipeline.similarity import (
        kmeans_assign,
        kmeans_update,
    )
    from noaa_oracle_spark.pipeline.text import span_dedup
    from pyspark.sql import functions as F  # noqa: F811

    run("span_dedup", lambda: span_dedup(docs).count())

    # --- LM-scoring ladder (q91 unigram / q106 bigram) and boilerplate
    # n-grams (q64) at corpus scale: the bigram rung is the evidence for
    # the r5 de-skew (doc-level pre-aggregation + precomputed per-type
    # log-probability; hot bigrams shuffle once per doc, not per
    # occurrence); boilerplate is a hot-gram shuffle by construction
    # (20% of docs share one sentence), the AQE-skew case.
    from noaa_oracle_spark.pipeline.text import (
        bigram_logprob,
        boilerplate_ngram_stats,
        unigram_logprob,
    )

    run("unigram_logprob", lambda: unigram_logprob(docs).count())
    run("bigram_logprob", lambda: bigram_logprob(docs).count())
    run("boilerplate_ngrams", lambda: boilerplate_ngram_stats(
        docs).filter(F.col("n_boilerplate") > 0).count())
    # the q106-style alternative: freq-filter to boilerplate TYPES, then
    # broadcast-mark the occurrence stream (no gram-keyed join at all)
    run("boilerplate_ngrams_bmark", lambda: boilerplate_ngram_stats(
        docs, plan="broadcast_mark"
    ).filter(F.col("n_boilerplate") > 0).count())

    # --- round-6 tokenizer-training / corpus-health rungs: both ride the
    # single word-type exchange (the q106 discipline), so corpus scale
    # costs one uniform shuffle plus vocabulary-scale math
    from noaa_oracle_spark.pipeline.text import bpe_pair_counts, zipf_slope

    run("bpe_pairs", lambda: bpe_pair_counts(docs).count())
    run("zipf_slope", lambda: zipf_slope(docs).count())
    run("weighted_sample", lambda: weighted_hash_sample(
        docs.withColumn(
            "w", F.least(F.length("text") / F.lit(800.0), F.lit(1.0))
        ),
        "doc_id", "w",
    ).count())
    emb = spark.read.parquet(os.path.join(FIXTURE, "embeddings.parquet"))
    seeds = emb.filter(F.col("vec_id") < 32)
    pts = emb.filter(F.col("vec_id") >= 32)
    # the filter forces the argmax to evaluate — a bare count() would let
    # Catalyst prune the entire assignment expression
    run("kmeans_assign", lambda: kmeans_assign(pts, seeds)
        .filter(F.col("cluster_id") >= 0).count())
    run("kmeans_assign_numpy", lambda: kmeans_assign(
        pts, seeds, backend="numpy")
        .filter(F.col("cluster_id") >= 0).count())
    run("kmeans_update", lambda: kmeans_update(
        kmeans_assign(pts, seeds, backend="numpy")).count())

    # --- round-3 heavy text/vector ops at corpus scale
    from noaa_oracle_spark.pipeline.similarity import semantic_dedup
    from noaa_oracle_spark.pipeline.text import exact_substring_spans

    run("exact_substring", lambda: exact_substring_spans(
        docs, min_len=30).filter(F.col("n_dup_spans") > 0).count())
    # gram-plan tiers: recompute (default) vs persist vs shuffle_reuse —
    # the measured comparison behind the default (SCALE.md)
    run("exact_substring_persist", lambda: exact_substring_spans(
        docs, min_len=30, gram_plan="persist")
        .filter(F.col("n_dup_spans") > 0).count())
    run("exact_substring_shufreuse", lambda: exact_substring_spans(
        docs, min_len=30, gram_plan="shuffle_reuse")
        .filter(F.col("n_dup_spans") > 0).count())

    # --- sequence packing: the distributed two-pass prefix sum (4096
    # hash-prefix buckets; no single-partition window) at corpus scale
    from noaa_oracle_spark.pipeline.sampling import pack_training_sequences

    run("pack_sequences", lambda: pack_training_sequences(
        docs, budget_tokens=2048, salt="bench")
        .filter(F.col("seq_id") >= 0).count())
    emb_all = spark.read.parquet(os.path.join(FIXTURE, "embeddings.parquet"))
    # PIPELINE_BENCH_CELLS: SemDeDup's k is the paper's own scale lever —
    # the within-cell verify is quadratic in cell SIZE, so k must grow
    # with the corpus (64 cells at 1M docs = 15.6k-vector cells = the
    # measured quadratic wall; 1024 cells restores ~1k-vector cells)
    n_cells = int(os.environ.get("PIPELINE_BENCH_CELLS", "64"))
    run("semantic_dedup", lambda: semantic_dedup(
        emb_all, emb_all.filter(F.col("vec_id") < n_cells), threshold=0.7,
    ).filter(F.col("is_dup")).count())
    run("semantic_dedup_numpy", lambda: semantic_dedup(
        emb_all, emb_all.filter(F.col("vec_id") < n_cells), threshold=0.7,
        assign_backend="numpy",
    ).filter(F.col("is_dup")).count())

    # --- PQ at corpus scale: train once, encode the 100k x 64 corpus,
    # ADC-search 10 queries against the codes
    from noaa_oracle_spark.pipeline.pq import pq_encode, pq_knn, pq_train

    def _pq_all():
        books = pq_train(emb, m=8, k=64, iters=2)
        enc = pq_encode(emb, books)
        qv = emb.filter(F.col("vec_id") < 10)
        return pq_knn(qv, enc, books, k=5).count()

    run("pq_train_encode_search", _pq_all)

    # --- decontamination tiers: the bloom prefilter's value is SHUFFLE
    # VOLUME — the gram stream entering the bench join. decon_grams_* count
    # that stream directly (all corpus grams vs bloom survivors); the
    # timed rungs compare the no-broadcast shuffle join against the
    # bloom-prefiltered one on identical output.
    from noaa_oracle_spark.pipeline.dedup import _word_shingles
    from noaa_oracle_spark.pipeline.text import (
        bloom_gram_filter,
        decontamination,
        decontamination_bloom,
    )

    d_bench = docs.filter(F.col("doc_id") % 97 == 0)
    d_train = docs.filter(F.col("doc_id") % 97 != 0)
    run("decon_shuffle", lambda: decontamination(
        d_train, d_bench, n=3, broadcast_bench=False).count())
    run("decon_bloom", lambda: decontamination_bloom(
        d_train, d_bench, n=3).count())
    run("decon_grams_all", lambda: _word_shingles(d_train, n=3).count())
    run("decon_grams_bloom_survivors", lambda: bloom_gram_filter(
        _word_shingles(d_train, n=3),
        _word_shingles(d_bench, n=3).select("shingle").distinct(),
    ).count())

    # --- mergeable-sketch rungs (q122-q124): KMV rides the distinct
    # (group, hash) stream through the two-phase per-bucket bottom-k cut
    # (no task holds more than a sort buffer); CMS builds its d*w cell
    # table from the term-TYPE dimension. Both should cost roughly the
    # one corpus-scale exchange their input stream already pays.
    from noaa_oracle_spark.pipeline.sketches import (
        countmin_heavy_hitters,
        kmv_distinct,
        kmv_jaccard,
    )

    sdocs = docs.withColumn("source", (F.col("doc_id") % 20).cast("string"))
    run("kmv_distinct", lambda: kmv_distinct(
        _word_shingles(sdocs, id_col="source", n=3),
        ["source"], F.col("shingle"), k=256).count())
    run("kmv_jaccard", lambda: kmv_jaccard(
        _word_shingles(sdocs, id_col="source", n=3),
        "source", F.col("shingle"), k=256).count())
    run("countmin_hh", lambda: countmin_heavy_hitters(
        docs, top_n=20).count())

    # --- q128 audio rung: mux every doc into a real PCM clip map-side,
    # parse + decode it back, extract integer features — the multimodal
    # tier's corpus throughput (pure mapInPandas, blobs never shuffle);
    # text_to_wav_media is the SAME mux the gate uses, so the bench
    # measures exactly the graded workload
    from noaa_oracle_spark.pipeline.multimodal import (
        audio_features,
        text_to_wav_media,
    )

    run("wav_features", lambda: audio_features(text_to_wav_media(docs))
        .filter(F.col("sum_sq") > 0).count())

    # --- crawl front door (r7): synthesize an HTML page per fixture doc
    # (nav + footer boilerplate around the real text) and run the
    # block-parse + link-density extraction; plus URL canonicalization
    # over one synthetic URL per doc (pure expressions).
    def _html_rung():
        from noaa_oracle_spark.pipeline.html import html_to_text

        pages = docs.select(
            "doc_id",
            F.concat(
                F.lit(
                    "<html><head><title>t</title><style>.x{}</style></head>"
                    "<body><nav><a href='/'>Home</a> <a href='/a'>About</a>"
                    " <a href='/c'>Contact</a></nav><h1>Doc "
                ),
                F.col("doc_id").cast("string"),
                F.lit("</h1><p>"),
                F.col("text"),
                F.lit(
                    "</p><div><a href='/1'>x</a> <a href='/2'>y</a></div>"
                    "<footer>c 2026</footer></body></html>"
                ),
            ).alias("html"),
        )
        return html_to_text(pages).filter(F.col("text") != "").count()

    run("html_extract", _html_rung)

    def _canon_rung():
        from noaa_oracle_spark.pipeline.web import canonical_url

        urls = docs.select(
            F.concat(
                F.lit("HTTPS://Site"),
                (F.col("doc_id") % 1000).cast("string"),
                F.lit(".Example.COM:443/p/"),
                F.col("doc_id").cast("string"),
                F.lit("?utm_source=x&b=2&a=1&fbclid=z#frag"),
            ).alias("url")
        )
        return urls.select(canonical_url(F.col("url")).alias("c")).filter(
            F.col("c").isNotNull()
        ).count()

    run("canonical_url", _canon_rung)

    # --- WARC record walk: N_DOCS records across ceil(N/5000)
    # member-gzip shards (the Common Crawl layout), manifest-mode read
    # (payload dropped at the source).  The shard fixture is built once
    # per size and reused.
    def _ensure_warc_fixture():
        import math as _math

        from noaa_oracle_spark.pipeline.warc import build_warc

        wdir = FIXTURE + "_warc"
        if not os.path.isdir(wdir):
            # build into a temp dir and rename LAST (the _generate
            # convention): an interrupted build must not leave a
            # partial fixture that later runs silently reuse — the
            # recorded throughput would then be over the wrong N
            tmp = wdir + ".building"
            if os.path.isdir(tmp):
                import shutil as _shutil

                _shutil.rmtree(tmp)
            os.makedirs(tmp)
            per = 5000
            body = (b"<html><body><p>" + b"crawl text " * 40
                    + b"</p></body></html>")
            n_shards = _math.ceil(N_DOCS / per)
            for s in range(n_shards):
                k = min(per, N_DOCS - s * per)
                recs = [
                    {
                        "type": "response",
                        "uri": f"https://site{(s * per + j) % 997}.test/p/{s * per + j}",
                        "http_status": 200,
                        "http_content_type": "text/html",
                        "payload": body,
                    }
                    for j in range(k)
                ]
                with open(
                    os.path.join(tmp, f"shard-{s:05d}.warc.gz"), "wb"
                ) as f:
                    f.write(build_warc(recs))
            os.rename(tmp, wdir)
        return wdir

    def _warc_rung():
        from noaa_oracle_spark.pipeline.warc import warc_records

        wdir = _ensure_warc_fixture()
        n = warc_records(spark, wdir, with_payload=False).filter(
            F.col("http_status") == 200
        ).count()
        if n != N_DOCS:
            raise AssertionError(
                f"warc_manifest rung read {n} records, expected {N_DOCS} "
                f"— stale/partial fixture at {wdir}?"
            )
        return n

    run("warc_manifest", _warc_rung)

    # --- crawl composite (r8): the WHOLE front door as its committed
    # single lazy plan (WARC walk → html_to_text → canonical_url /
    # registrable_domain) over the same shard fixture — the separate
    # walk (40.9 s/1M) and extraction (144 s/1M) rungs prove the
    # stages; this rung proves the composition really is one pass
    # (1 binaryFile scan, 0 joins) at scale.
    def _crawl_rung():
        from noaa_oracle_spark.pipeline.warc import crawl_to_documents

        wdir = _ensure_warc_fixture()
        n = crawl_to_documents(spark, wdir).count()
        if n != N_DOCS:
            raise AssertionError(
                f"crawl_docs rung produced {n} documents, expected "
                f"{N_DOCS}"
            )
        return n

    run("crawl_docs", _crawl_rung)

    # --- robots.txt compliance (r8 de-weak evidence): N_DOCS urls
    # across PIPELINE_BENCH_ROBOTS_HOSTS distinct hosts (default 100k —
    # a big-crawl host dimension), every host contributing parsed
    # rules; both join plans measured.  The broadcast row is the
    # default path; the shuffle row is the beyond-broadcast fallback.
    n_hosts = int(os.environ.get("PIPELINE_BENCH_ROBOTS_HOSTS", "100000"))

    def _robots_frames():
        from pyspark.sql import functions as FF

        doc_urls = docs.select(
            "doc_id",
            FF.concat(
                FF.lit("https://h"),
                (FF.col("doc_id") % n_hosts).cast("string"),
                FF.lit(".test/p"),
                (FF.col("doc_id") % 7).cast("string"),
                FF.lit("/f"),
                FF.col("doc_id").cast("string"),
                FF.when(FF.col("doc_id") % 3 == 0, FF.lit(".pdf")).otherwise(
                    FF.lit("")
                ),
            ).alias("url"),
        )
        robots = spark.range(n_hosts).select(
            FF.concat(FF.lit("h"), FF.col("id").cast("string"), FF.lit(".test"))
            .alias("host"),
            FF.concat(
                FF.lit("User-agent: *\nDisallow: /p"),
                (FF.col("id") % 7).cast("string"),
                FF.lit("/\nDisallow: /*.pdf$\nAllow: /p"),
                (FF.col("id") % 7).cast("string"),
                FF.lit("/ok/"),
            ).alias("robots_txt"),
        )
        return doc_urls, robots

    def _robots_rung(plan):
        from noaa_oracle_spark.pipeline.web import filter_robots_disallowed

        doc_urls, robots = _robots_frames()
        return filter_robots_disallowed(doc_urls, robots, plan=plan).count()

    run("robots_filter_inline", lambda: _robots_rung("inline"))
    run("robots_filter_broadcast", lambda: _robots_rung("broadcast"))
    run("robots_filter_shuffle", lambda: _robots_rung("shuffle"))

    # --- frontier discovery (r8 verdict ask #4): out-link extraction
    # over the same synthetic page bodies as html_extract (5 anchors
    # per page, one relative to the page url), and politeness
    # scheduling over the robots rung's url frame (N_DOCS urls,
    # n_hosts-host dimension with declared crawl-delays).
    def _links_rung():
        from noaa_oracle_spark.pipeline.html import html_links

        pages = docs.select(
            "doc_id",
            F.concat(
                F.lit("https://site"),
                (F.col("doc_id") % 997).cast("string"),
                F.lit(".test/p/"),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            F.concat(
                F.lit(
                    "<html><body><nav><a href='/'>Home</a>"
                    " <a href='/about'>About</a>"
                    " <a rel='nofollow' href='/login'>Login</a></nav><p>"
                ),
                F.col("text"),
                F.lit("</p><a href='next/"),
                F.col("doc_id").cast("string"),
                F.lit("'>n</a><a href='https://other.test/x'>x</a>"
                      "</body></html>"),
            ).alias("html"),
        )
        return html_links(pages).count()

    run("html_links", _links_rung)

    def _politeness_rung():
        from noaa_oracle_spark.pipeline.web import politeness_waves

        doc_urls, _ = _robots_frames()
        delays = spark.range(n_hosts).select(
            F.concat(
                F.lit("h"), F.col("id").cast("string"), F.lit(".test")
            ).alias("host"),
            ((F.col("id") % 10) / 2.0 + 0.5).alias("delay_s"),
        )
        return politeness_waves(
            doc_urls, delays=delays, default_delay=1.0
        ).count()

    run("politeness_waves", _politeness_rung)

    # --- multi-round crawl driver (r9): 3 rounds from N_DOCS/100 seeds
    # over an N_DOCS-page synthetic link graph (each page links to 2
    # others, deterministic wiring) — measures the loop machinery
    # (per-round fetch join against the full page table, link
    # extraction, accumulated-seen anti-join, per-round persist) at
    # corpus scale.
    def _crawl_rounds_rung():
        from noaa_oracle_spark.pipeline.web import (
            crawl_rounds,
            table_fetcher,
        )

        def page_url(col):
            return F.concat(
                F.lit("https://site"),
                (col % 997).cast("string"),
                F.lit(".test/p/"),
                col.cast("string"),
            )

        pages = docs.select(
            page_url(F.col("doc_id")).alias("url"),
            F.concat(
                F.lit("<html><body><p>"),
                F.col("text"),
                F.lit("</p><a href='"),
                page_url((F.col("doc_id") * 2) % N_DOCS),
                F.lit("'>a</a><a href='"),
                page_url((F.col("doc_id") + 1) % N_DOCS),
                F.lit("'>b</a></body></html>"),
            ).alias("html"),
        )
        seeds = docs.filter(F.col("doc_id") % 100 == 0).select(
            page_url(F.col("doc_id")).alias("url")
        )
        return crawl_rounds(
            seeds, table_fetcher(pages), rounds=3
        ).count()

    run("crawl_rounds", _crawl_rounds_rung)

    # --- perceptual image dedup (r7 verdict ask #9): pHash banded
    # Hamming join over PIPELINE_BENCH_IMAGES P6 PPM blobs (default
    # 100k, 32x32) with a planted 1% near-dup cluster of one base image
    # — ONE hot (band, value) bucket, the AQE skew-join case the
    # operator docstring names.
    def _phash_rung():
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        from noaa_oracle_spark.pipeline.multimodal import phash_near_dupes

        n_img = int(os.environ.get("PIPELINE_BENCH_IMAGES", "100000"))
        idir = f"/tmp/noaa_pipeline_bench_images_{n_img}"
        ipath = os.path.join(idir, "media.parquet")
        if not os.path.exists(ipath):
            tmp = idir + ".building"
            import shutil as _shutil

            if os.path.isdir(tmp):
                _shutil.rmtree(tmp)
            os.makedirs(tmp)
            irng = np.random.RandomState(SEED + 7)
            # one HOT cluster (1% of the corpus near-dups of a single
            # base — the viral-image band-bucket skew case) + unique
            # noise for the rest.  Cluster size is bounded so the rung
            # times the join, not the emission of a quadratic pair list
            # (a 5% cluster at 100k = 12M output pairs, measured).
            base = irng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
            n_hot = n_img // 100
            header = b"P6\n32 32\n255\n"
            blobs = []
            for j in range(n_img):
                if j < n_hot:
                    img = base.copy()
                    # flip a few pixels: near-dup of the base
                    xs = irng.randint(0, 32, 3)
                    ys = irng.randint(0, 32, 3)
                    img[ys, xs] = irng.randint(0, 256, (3, 3))
                else:
                    img = irng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
                blobs.append(header + img.tobytes())
            _pq.write_table(
                _pa.table(
                    {
                        "media_id": _pa.array(range(n_img), _pa.int64()),
                        "kind": _pa.array(["image"] * n_img),
                        "content": _pa.array(blobs, _pa.binary()),
                    }
                ),
                os.path.join(tmp, "media.parquet"),
            )
            os.rename(tmp, idir)
        media = spark.read.parquet(ipath)
        return phash_near_dupes(media, max_distance=6, bands=8).count()

    run("phash_near_dupes", _phash_rung)

    # --- crawl → multimodal composite: the same image corpus packaged
    # as WARC image responses (the Common Crawl layout), then
    # crawl_to_media → phash_near_dupes end-to-end — the two-call
    # crawl-to-perceptual-dedup story at scale.
    def _crawl_media_rung():
        from noaa_oracle_spark.pipeline.multimodal import phash_near_dupes
        from noaa_oracle_spark.pipeline.warc import build_warc, crawl_to_media

        n_img = int(os.environ.get("PIPELINE_BENCH_IMAGES", "100000"))
        wdir = f"/tmp/noaa_pipeline_bench_imgwarc_{n_img}"
        if not os.path.isdir(wdir):
            import shutil as _shutil

            tmp = wdir + ".building"
            if os.path.isdir(tmp):
                _shutil.rmtree(tmp)
            os.makedirs(tmp)
            irng = np.random.RandomState(SEED + 7)
            base = irng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
            n_hot = n_img // 100
            header = b"P6\n32 32\n255\n"
            per = 1000
            shard_recs = []
            s = 0
            for j in range(n_img):
                if j < n_hot:
                    img = base.copy()
                    xs = irng.randint(0, 32, 3)
                    ys = irng.randint(0, 32, 3)
                    img[ys, xs] = irng.randint(0, 256, (3, 3))
                else:
                    img = irng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
                shard_recs.append(
                    {
                        "type": "response",
                        "uri": f"https://img{j % 997}.test/i/{j}.ppm",
                        "http_status": 200,
                        "http_content_type": "image/x-portable-pixmap",
                        "payload": header + img.tobytes(),
                    }
                )
                if len(shard_recs) == per or j == n_img - 1:
                    with open(
                        os.path.join(tmp, f"img-{s:05d}.warc.gz"), "wb"
                    ) as f:
                        f.write(build_warc(shard_recs))
                    shard_recs = []
                    s += 1
            os.rename(tmp, wdir)
        media = crawl_to_media(spark, wdir)
        return phash_near_dupes(media, max_distance=6, bands=8).count()

    run("crawl_media_phash", _crawl_media_rung)

    # --- distributed WARC write: re-shard the whole documents fixture
    # as member-gzip WARC (the write side of the crawl tier) — one task
    # per shard, deterministic bytes.
    def _warc_write_rung():
        import shutil as _shutil

        from noaa_oracle_spark.pipeline.warc import write_warc_shards

        wdest = FIXTURE + "_warc_out"
        _shutil.rmtree(wdest, ignore_errors=True)
        docs_url = docs.withColumn(
            "url",
            F.concat(F.lit("https://d.test/"), F.col("doc_id").cast("string")),
        )
        m = write_warc_shards(docs_url, wdest, records_per_shard=5000)
        return int(m.agg(F.sum("n_records")).collect()[0][0])

    run("warc_write", _warc_write_rung)

    # --- exact embedding near-dup pairs: broadcast GEMM kernel vs the
    # blocked (no-driver-materialization) block-pair join on the same
    # vectors. At bench scale both are compute-bound on the identical
    # O(n²/2) numpy product, so blocked ≈ broadcast + one bounded shuffle;
    # what the broadcast tier CANNOT do is run past driver memory — the
    # guard rung shows the failover behavior the 100 TB path relies on.
    from noaa_oracle_spark.pipeline.similarity import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_blocked,
    )

    n_pairs_vecs = int(os.environ.get("PIPELINE_BENCH_EMB_PAIRS", "20000"))
    vecs = emb.filter(F.col("vec_id") < n_pairs_vecs)
    run("emb_pairs_broadcast", lambda: embedding_cosine_pairs(
        vecs, threshold=0.5).count())
    run("emb_pairs_blocked", lambda: embedding_cosine_pairs_blocked(
        vecs, threshold=0.5, num_blocks=8).count())

    def _guarded():
        try:
            embedding_cosine_pairs(
                vecs, threshold=0.5, max_broadcast_rows=1000
            ).count()
            return -1  # should not happen
        except ValueError:
            # beyond the broadcast threshold only the blocked tier runs
            return embedding_cosine_pairs(
                vecs, threshold=0.5, strategy="blocked", num_blocks=8
            ).count()

    run("emb_pairs_beyond_broadcast", _guarded)

    # --- chain-topology rung: the adversarial shape for min-propagation
    # (rounds == diameter) vs the two-phase star algorithm (rounds ==
    # O(log^2 n) regardless of diameter). Thresholded similarity graphs are
    # shallow, so this is the stress case, not the common case — it is the
    # evidence behind choosing star as the distributed default.
    from pyspark.sql import functions as F

    n_chain = int(os.environ.get("PIPELINE_BENCH_CHAIN_NODES", "20000"))
    chain_len = int(os.environ.get("PIPELINE_BENCH_CHAIN_LEN", "50"))
    chain_nodes = spark.range(n_chain).select(F.col("id").alias("doc_id"))
    chain_edges = (
        spark.range(n_chain)
        .filter((F.col("id") % chain_len) != chain_len - 1)
        .filter(F.col("id") < n_chain - 1)
        .select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
    )
    for alg in ("star", "propagate"):
        st: dict = {}
        run(
            f"components_chain_{alg}",
            lambda alg=alg, st=st: connected_components(
                chain_nodes,
                chain_edges,
                driver_edge_threshold=0,
                algorithm=alg,
                stats=st,
            ).count(),
        )
        if f"components_chain_{alg}" in out:
            out[f"components_chain_{alg}"]["rounds"] = st["rounds"]

    print(json.dumps({
        "metric": "pipeline_ops_at_corpus_scale",
        "n_docs": N_DOCS,
        "queries": out,
    }))


if __name__ == "__main__":
    main()
