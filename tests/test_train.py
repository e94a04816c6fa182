"""In-engine logistic training (pipeline/train.py): gradient
correctness vs numpy, convergence on separable data, partitioning
determinism, and the quality-classifier train→serve loop."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.train import (
    fit_quality_classifier,
    logistic_predict,
    train_logistic,
)


def _xy(spark, n=400, seed=5, parts=None):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 2)
    # planted rule: 2*x0 - x1 + 0.5 > 0
    y = (2 * x[:, 0] - x[:, 1] + 0.5 > 0).astype(int)
    df = spark.createDataFrame(
        [(float(a), float(b), int(c)) for (a, b), c in zip(x, y)],
        "f0 double, f1 double, y long",
    )
    return (df.repartition(parts) if parts else df), x, y


def test_first_iteration_gradient_matches_numpy(spark):
    df, x, y = _xy(spark, n=100)
    fit = train_logistic(df, ["f0", "f1"], "y", iters=1, lr=1.0)
    # from w=0, b=0: p=0.5 for all rows
    err = 0.5 - y
    want_gb = err.mean()
    want_g = (err[:, None] * x).mean(axis=0)
    assert fit["bias"] == pytest.approx(-want_gb, rel=1e-9)
    assert fit["weights"][0] == pytest.approx(-want_g[0], rel=1e-9)
    assert fit["weights"][1] == pytest.approx(-want_g[1], rel=1e-9)
    assert fit["losses"][0] == pytest.approx(-np.log(0.5), rel=1e-9)
    assert fit["n"] == 100


def test_converges_and_separates(spark):
    df, x, y = _xy(spark)
    fit = train_logistic(df, ["f0", "f1"], "y", iters=150, lr=0.8)
    # loss strictly improves over training and ends low
    assert fit["losses"][-1] < 0.15 < fit["losses"][0]
    assert fit["losses"][-1] == min(fit["losses"])
    scored = logistic_predict(
        df, ["f0", "f1"], fit["weights"], fit["bias"]
    )
    acc = scored.filter(F.col("label_pred") == F.col("y")).count() / 400
    assert acc >= 0.97
    # recovered direction matches the planted rule (w0 > 0 > w1)
    assert fit["weights"][0] > 0 > fit["weights"][1]


def test_partitioning_invariance(spark):
    df1, _, _ = _xy(spark, parts=None)
    df2, _, _ = _xy(spark, parts=13)
    f1 = train_logistic(df1, ["f0", "f1"], "y", iters=20, lr=0.5)
    f2 = train_logistic(df2, ["f0", "f1"], "y", iters=20, lr=0.5)
    for a, b in zip(f1["weights"] + [f1["bias"]], f2["weights"] + [f2["bias"]]):
        assert a == pytest.approx(b, abs=1e-9)


def test_validation_errors(spark):
    df, _, _ = _xy(spark, n=10)
    with pytest.raises(ValueError):
        train_logistic(df, [], "y")
    with pytest.raises(ValueError):
        train_logistic(df, ["f0"], "y", iters=0)
    with pytest.raises(ValueError):
        train_logistic(df.filter("f0 > 1e9"), ["f0"], "y", iters=1)
    with pytest.raises(ValueError):
        logistic_predict(df, ["f0", "f1"], [1.0], 0.0)


def test_fit_quality_classifier_train_serve_loop(spark):
    """Label documents with the DEFAULT production weights, train from
    scratch on those labels, and the fitted integer milli-weights must
    reproduce the labels through the exact serving path."""
    from noaa_oracle_spark.pipeline.text import quality_classifier

    rng = np.random.RandomState(11)
    stop = ["the", "and", "of", "to", "a"]
    junk = ["zqx9", "77##", "@@@@", "kkkk"]
    rows = []
    for i in range(300):
        good = rng.rand() < 0.5
        n = rng.randint(5, 60)
        pool = stop if good else junk
        words = [pool[rng.randint(len(pool))] for _ in range(n)]
        if good:
            words += ["word%d" % rng.randint(50) for _ in range(n)]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labels = quality_classifier(docs).select(
        "doc_id", F.col("keep").alias("label")
    )
    base_rate = labels.agg(F.avg("label")).collect()[0][0]
    assert 0.2 < base_rate < 0.8  # both classes present
    w = fit_quality_classifier(docs, labels, iters=120, lr=5e-4)
    assert set(w) == {"bias", "stop_permille", "digit_permille",
                      "n_tokens_capped"}
    refit = quality_classifier(docs, weights=w).select("doc_id", "keep")
    agree = (
        refit.join(labels, "doc_id")
        .filter(F.col("keep") == F.col("label"))
        .count()
    )
    assert agree >= 270  # >= 90% label reproduction through serving


# ---------------------------------------------------------------------------
# BM25 lexical retrieval (text.bm25_scores) — pytest-only evidence
# ---------------------------------------------------------------------------


def test_bm25_matches_reference_formula(spark):
    import math

    from noaa_oracle_spark.pipeline.text import bm25_scores

    corpus = {
        1: "apple banana apple cherry",
        2: "apple apple apple apple apple apple",
        3: "banana cherry date egg fig grape",
        4: "unrelated words only here",
        5: "apple banana",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    q = ["apple", "banana"]
    got = {
        r.doc_id: (r.bm25, r.rnk)
        for r in bm25_scores(docs, q, k=10).collect()
    }

    # reference computation (Lucene idf, k1=1.2, b=0.75)
    toks = {i: t.split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for d in toks.values() if t in d) for t in q}
    want = {}
    for i, d in toks.items():
        s = 0.0
        for t in q:
            tf = d.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(d) / avgdl))
        if s > 0:
            want[i] = round(s, 6)
    assert {i: v for i, (v, _) in got.items()} == want
    # doc 4 has no query terms: absent, not zero-scored
    assert 4 not in got
    # ranks follow (score desc, id asc)
    order = [i for i, _ in sorted(got.items(), key=lambda kv: kv[1][1])]
    assert order == [i for i, _ in sorted(
        want.items(), key=lambda kv: (-kv[1], kv[0])
    )]

    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_null_labels_raise_cleanly_and_unpersist(spark):
    """Round-7 review wave 3: NULL labels must raise a clear
    validation error (Spark's avg would silently train on the non-NULL
    subset) and must not leak the persisted training frame.  (Bad
    STRING labels already fail loudly via the ANSI cast.)"""
    df = spark.createDataFrame(
        [(1.0, 1), (2.0, None), (3.0, 0)], "f0 double, y int"
    )
    def n_persisted():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_persisted()
    with pytest.raises(ValueError, match="labels are NULL"):
        train_logistic(df, ["f0"], "y", iters=1)
    assert n_persisted() == before  # try/finally released the persist


def test_feature_nulls_raise_instead_of_silent_subset(spark):
    """Round-8 advice: a NULL in any FEATURE column NULLs err for that
    row, so avg() silently dropped it from every gradient while
    count(*) still reported it — must raise."""
    df = spark.createDataFrame(
        [(1.0, 0.5, 1), (None, 0.2, 0), (3.0, None, 1), (2.0, 1.0, 0)],
        "f0 double, f1 double, y int",
    )
    with pytest.raises(ValueError, match="feature NULLs exclude 2 of 4"):
        train_logistic(df, ["f0", "f1"], "y", iters=1)


def _badly_scaled(spark, n=300, seed=11):
    """One feature in [0,1], one in the millions — the GD footgun."""
    rng = np.random.RandomState(seed)
    x0 = rng.rand(n)
    x1 = rng.randn(n) * 1e6 + 5e6
    y = (x0 * 4.0 - 2.0 + (x1 - 5e6) / 1e6 > 0).astype(int)
    return spark.createDataFrame(
        [(float(a), float(b), int(c)) for a, b, c in zip(x0, x1, y)],
        "f0 double, f1 double, y long",
    )


def test_divergence_guard_and_standardize_fix(spark):
    """On mismatched feature scales the unstandardized run diverges
    loudly (not silently returning garbage), and standardize=True
    converges at the same lr; the returned weights are de-standardized
    so raw-space serving reproduces the fit."""
    df = _badly_scaled(spark).cache()
    try:
        with pytest.raises(ValueError, match="diverging"):
            train_logistic(df, ["f0", "f1"], "y", iters=50, lr=0.5)
        fit = train_logistic(
            df, ["f0", "f1"], "y", iters=80, lr=0.5, standardize=True
        )
        assert fit["losses"][-1] < 0.35 < fit["losses"][0]
        assert fit["losses"][-1] == min(fit["losses"])
        # raw-space serving: de-standardized weights score raw columns
        scored = logistic_predict(
            df, ["f0", "f1"], fit["weights"], fit["bias"]
        )
        acc = scored.filter(
            F.col("label_pred") == F.col("y")
        ).count() / scored.count()
        assert acc > 0.9
    finally:
        df.unpersist()


def test_standardize_noop_on_constant_feature(spark):
    """Zero-variance feature: std falls back to 1 (no div-by-zero) and
    the constant folds into the bias — training still converges."""
    df = spark.createDataFrame(
        [(float(i % 7) / 7.0, 42.0, int(i % 7 < 3)) for i in range(210)],
        "f0 double, fconst double, y long",
    )
    fit = train_logistic(
        df, ["f0", "fconst"], "y", iters=60, lr=0.5, standardize=True
    )
    assert all(np.isfinite(fit["weights"])) and np.isfinite(fit["bias"])
    assert fit["losses"][-1] < fit["losses"][0]


def test_bm25_index_save_load_query_equality(spark, tmp_path):
    """The persisted inverted index serves the EXACT bm25_scores result
    (shared scoring tail): save → load → bm25_query == bm25_scores on
    the same corpus, for multiple queries and k1/b settings; a torn
    re-save (postings replaced, manifest stale) fails loudly."""
    from noaa_oracle_spark.pipeline.text import (
        bm25_query,
        bm25_scores,
        load_bm25_index,
        save_bm25_index,
    )

    corpus = {
        1: "apple banana apple cherry",
        2: "apple apple apple apple apple apple",
        3: "banana cherry date egg fig grape",
        4: "unrelated words only here",
        5: "apple banana",
        6: "",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    path = str(tmp_path / "bm25_idx")
    save_bm25_index(docs, path)
    idx = load_bm25_index(spark, path)
    assert idx["manifest"].n_docs == 5  # the empty doc tokenizes to none

    for terms, k1, b in (
        (["apple", "banana"], 1.2, 0.75),
        (["cherry"], 0.9, 0.4),
        (["apple", "nosuchterm"], 1.2, 0.75),
    ):
        want = [
            tuple(r)
            for r in bm25_scores(docs, terms, k=10, k1=k1, b=b).collect()
        ]
        got = [
            tuple(r)
            for r in bm25_query(idx, terms, k=10, k1=k1, b=b).collect()
        ]
        assert got == want, terms

    with pytest.raises(ValueError, match="non-empty query term"):
        bm25_query(idx, ["", None] if False else [""])

    # torn re-save: postings rewritten for a BIGGER corpus, manifest
    # still the old one → load must refuse
    docs2 = docs.union(
        spark.createDataFrame([(7, "apple date")], "doc_id long, text string")
    )
    from noaa_oracle_spark.pipeline.dedup import spread
    from pyspark.sql import functions as FX

    words2 = spread(docs2).select(
        "doc_id", FX.explode(FX.split("text", " ")).alias("term")
    ).filter(FX.col("term") != "")
    words2.groupBy("doc_id", "term").agg(
        FX.count(FX.lit(1)).alias("tf")
    ).write.mode("overwrite").parquet(f"{path}/postings")
    with pytest.raises(ValueError, match="torn or partial"):
        load_bm25_index(spark, path)


def test_rrf_fuse_hand_computed_and_hybrid(spark):
    """RRF against a hand computation, plus the real hybrid composition:
    fuse a BM25 ranking with a vector ranking and check the doc present
    in BOTH lists outranks single-list docs."""
    from noaa_oracle_spark.pipeline.text import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rnk int"
    )
    b = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rnk int"
    )
    got = {
        r.doc_id: (r.rrf_score, r.rnk)
        for r in rrf_fuse([a, b], k=60, topk=10).collect()
    }
    import pytest as _pytest

    def rr(*ranks):
        return round(sum(1.0 / (60 + r) for r in ranks), 6)

    assert got[20] == (rr(2, 1), 1)   # in both lists → top
    assert got[10] == (rr(1), 2)
    assert got[40] == (rr(2), 3)
    assert got[30] == (rr(3), 4)

    # ties break by ascending doc id: two docs with identical rank sets
    c = spark.createDataFrame([(7, 1), (3, 2)], "doc_id long, rnk int")
    d = spark.createDataFrame([(3, 1), (7, 2)], "doc_id long, rnk int")
    tied = [r.doc_id for r in rrf_fuse([c, d], topk=2).collect()]
    assert tied == [3, 7]

    with _pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with _pytest.raises(ValueError, match="positive"):
        rrf_fuse([a], k=0)


def test_rrf_hybrid_bm25_plus_vector(spark, tmp_path):
    """End-to-end hybrid retrieval: BM25 over text + ADC over embeddings,
    fused — the serve stack's two endpoints meeting in one ranking."""
    import numpy as np

    from noaa_oracle_spark.pipeline.pq import pq_encode, pq_knn, pq_train
    from noaa_oracle_spark.pipeline.text import bm25_scores, rrf_fuse

    docs = spark.createDataFrame(
        [
            (0, "query terms appear here exactly"),
            (1, "query terms appear here too"),
            (2, "nothing relevant lexically"),
            (3, "noise words padding text"),
        ]
        + [(i, f"filler document {i}") for i in range(4, 20)],
        "doc_id long, text string",
    )
    rng = np.random.RandomState(5)
    vecs = rng.randn(20, 8)
    vecs[2] = vecs[0] + 0.01 * rng.randn(8)  # doc 2: vector-close to query
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    lex = bm25_scores(docs, ["query", "terms"], k=5)
    books = pq_train(emb, m=4, k=8, iters=1)
    q = emb.filter(F.col("vec_id") == 0)
    vec = pq_knn(q, pq_encode(emb, books), books, k=5).select(
        F.col("n_id").alias("doc_id"), F.col("rank").alias("rnk")
    )
    fused = rrf_fuse([lex, vec], topk=5).collect()
    ids = [r.doc_id for r in fused]
    assert 1 in ids  # lexical hit survives fusion
    assert 2 in ids  # vector hit survives fusion


def test_merge_bm25_indexes_equals_full_rebuild(spark, tmp_path):
    """Index two disjoint corpus shards separately, merge — queries must
    equal the index built over the concatenated corpus exactly;
    overlapping shards fail loudly."""
    from noaa_oracle_spark.pipeline.text import (
        bm25_query,
        load_bm25_index,
        merge_bm25_indexes,
        save_bm25_index,
    )

    shard_a = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    shard_b = spark.createDataFrame(
        [(3, "apple date egg"), (4, "cherry cherry apple banana")],
        "doc_id long, text string",
    )
    pa_, pb, pm, pfull = (
        str(tmp_path / n) for n in ("a", "b", "merged", "full")
    )
    save_bm25_index(shard_a, pa_)
    save_bm25_index(shard_b, pb)
    merge_bm25_indexes(spark, [pa_, pb], pm)
    save_bm25_index(shard_a.union(shard_b), pfull)

    m, f = load_bm25_index(spark, pm), load_bm25_index(spark, pfull)
    assert (m["manifest"].n_docs, m["manifest"].avgdl, m["manifest"].n_postings) == (
        f["manifest"].n_docs, f["manifest"].avgdl, f["manifest"].n_postings
    )
    for terms in (["apple"], ["banana", "cherry"], ["apple", "egg"]):
        got = [tuple(r) for r in bm25_query(m, terms, k=10).collect()]
        want = [tuple(r) for r in bm25_query(f, terms, k=10).collect()]
        assert got == want, terms

    # overlap: shard_a merged with itself must raise
    with pytest.raises(ValueError, match="overlap"):
        merge_bm25_indexes(spark, [pa_, pa_], str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="at least two"):
        merge_bm25_indexes(spark, [pa_], str(tmp_path / "bad2"))


def test_append_bm25_index_equals_full_rebuild(spark, tmp_path):
    """Two sequential appends onto a saved shard must serve exactly the
    index built over the concatenated corpus (the streaming-ingest
    inner loop: one append per arriving batch); duplicate ids, wrong
    id column, and a torn append all fail loudly."""
    from noaa_oracle_spark.pipeline.text import (
        append_bm25_index,
        bm25_query,
        load_bm25_index,
        save_bm25_index,
    )

    batches = [
        [(1, "apple banana apple"), (2, "banana cherry")],
        [(3, "apple date egg"), (4, "cherry cherry apple banana")],
        [(5, "egg fig apple"), (6, "")],
    ]
    frames = [
        spark.createDataFrame(b, "doc_id long, text string")
        for b in batches
    ]
    grown, full = str(tmp_path / "grown"), str(tmp_path / "full")
    save_bm25_index(frames[0], grown)
    assert append_bm25_index(spark, grown, frames[1]) == 2
    # doc 6 is empty: it tokenizes to zero terms, so n_docs grows by 1
    assert append_bm25_index(spark, grown, frames[2]) == 1

    save_bm25_index(frames[0].union(frames[1]).union(frames[2]), full)
    g, f = load_bm25_index(spark, grown), load_bm25_index(spark, full)
    assert (
        g["manifest"].n_docs, g["manifest"].avgdl, g["manifest"].n_postings
    ) == (
        f["manifest"].n_docs, f["manifest"].avgdl, f["manifest"].n_postings
    )
    for terms in (["apple"], ["banana", "cherry"], ["egg", "fig"]):
        got = [tuple(r) for r in bm25_query(g, terms, k=10).collect()]
        want = [tuple(r) for r in bm25_query(f, terms, k=10).collect()]
        assert got == want, terms

    # at-least-once replay of an already-appended batch must refuse
    with pytest.raises(ValueError, match="disjoint"):
        append_bm25_index(spark, grown, frames[1])
    with pytest.raises(ValueError, match="id column"):
        append_bm25_index(
            spark, grown,
            frames[1].withColumnRenamed("doc_id", "other"),
            id_col="other",
        )

    # torn append: postings land, manifest write dies → load refuses
    from noaa_oracle_spark.pipeline.text import _bm25_tf

    tf = _bm25_tf(
        spark.createDataFrame([(9, "zzz yyy")], "doc_id long, text string"),
        "text", "doc_id",
    )
    tf.write.mode("append").parquet(f"{grown}/postings")
    with pytest.raises(ValueError, match="torn or partial"):
        load_bm25_index(spark, grown)


def test_compact_bm25_index_restores_layout_and_scores(spark, tmp_path):
    """Compaction after many small appends: the compacted index serves
    scores identical to the fragmented one, its postings collapse back
    to the fresh-save file layout, and in-place compaction refuses
    (concurrent readers would race the rewrite)."""
    from noaa_oracle_spark.pipeline.text import (
        _parquet_file_count,
        append_bm25_index,
        bm25_query,
        compact_bm25_index,
        load_bm25_index,
        save_bm25_index,
    )

    docs = [(i, f"w{i % 7} w{i % 3} apple") for i in range(40)]
    frames = [
        spark.createDataFrame(docs[lo : lo + 5], "doc_id long, text string")
        for lo in range(0, 40, 5)
    ]
    frag = str(tmp_path / "frag")
    save_bm25_index(frames[0], frag)
    for f in frames[1:]:
        assert append_bm25_index(spark, frag, f) == 5

    out = str(tmp_path / "compacted")
    stats = compact_bm25_index(spark, frag, out)
    # 7 appends each added >=1 postings file; compaction collapses them
    assert stats["postings_files_before"] > stats["postings_files_after"]
    assert stats["n_docs"] == 40

    g = load_bm25_index(spark, frag)
    c = load_bm25_index(spark, out)
    assert (g["manifest"].n_docs, g["manifest"].avgdl,
            g["manifest"].n_postings) == (
        c["manifest"].n_docs, c["manifest"].avgdl, c["manifest"].n_postings
    )
    for terms in (["apple"], ["w1", "w2"], ["w0", "w5"]):
        got = [tuple(r) for r in bm25_query(c, terms, k=10).collect()]
        want = [tuple(r) for r in bm25_query(g, terms, k=10).collect()]
        assert got == want, terms
    assert _parquet_file_count(spark, f"{out}/postings") == stats[
        "postings_files_after"
    ]

    with pytest.raises(ValueError, match="must differ"):
        compact_bm25_index(spark, frag, frag)


def test_bm25_index_build_is_partitioning_invariant(spark, tmp_path):
    """The persisted index must not depend on how the input corpus was
    partitioned or ordered: indexes built from a 1-partition, an
    8-partition, and a reverse-sorted layout of the same documents
    serve byte-identical manifests and identical scores."""
    from noaa_oracle_spark.pipeline.text import (
        bm25_query,
        load_bm25_index,
        save_bm25_index,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 3} w{i % 11} common") for i in range(200)],
        "doc_id long, text string",
    )
    layouts = {
        "one": docs.coalesce(1),
        "many": docs.repartition(8),
        "rev": docs.orderBy(F.desc("doc_id")),
    }
    idxs = {}
    for name, df in layouts.items():
        p = str(tmp_path / name)
        save_bm25_index(df, p)
        idxs[name] = load_bm25_index(spark, p)
    manifests = {
        (i["manifest"].n_docs, i["manifest"].avgdl, i["manifest"].n_postings)
        for i in idxs.values()
    }
    assert len(manifests) == 1
    results = {
        name: tuple(
            tuple(r)
            for r in bm25_query(idx, ["w1", "common"], k=10).collect()
        )
        for name, idx in idxs.items()
    }
    assert len(set(results.values())) == 1
