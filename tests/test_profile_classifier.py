"""Unit tests for the round-6 additions: the generic two-pass global
rank, per-source percentile profiling, length-bucketed batching, the
logistic quality classifier, and IVF-PQ exact re-ranking."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.profile import (
    global_rank,
    length_batches,
    source_percentiles,
)
from noaa_oracle_spark.pipeline.text import quality_classifier

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- profile


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_global_rank_matches_single_node_row_number(spark):
    rnd = random.Random(11)
    rows = [(i, rnd.randrange(50)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.rank
        for r in global_rank(
            df, [("v", "asc"), ("id", "asc")], n_parts=7
        ).collect()
    }
    want = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want


def test_global_rank_invariant_to_input_partitioning(spark):
    rows = [(i, (i * 37) % 101) for i in range(200)]
    df1 = spark.createDataFrame(rows, "id long, v long").repartition(13)
    df2 = spark.createDataFrame(rows, "id long, v long").coalesce(1)
    order = [("v", "desc"), ("id", "asc")]
    r1 = sorted(map(tuple, global_rank(df1, order, n_parts=5).collect()))
    r2 = sorted(map(tuple, global_rank(df2, order, n_parts=3).collect()))
    assert r1 == r2


def test_global_rank_permutation_at_scale(spark):
    """Round-6 advisor regression (ADVICE high): the old kernel's two
    jobs could land on DIFFERENT sampled range boundaries, silently
    duplicating/skipping ranks — empirically reproduced at 300k rows.
    The literal-boundary kernel must produce an exact permutation
    1..n at that scale."""
    n = 300_000
    df = spark.range(n).select(
        F.col("id"),
        (F.xxhash64(F.col("id")) % 1000).alias("v"),
    )
    ranked = global_rank(df, [("v", "asc"), ("id", "asc")], n_parts=32)
    row = ranked.agg(
        F.count("*").alias("n"),
        F.countDistinct("rank").alias("d"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
    ).collect()[0]
    assert (row.n, row.d, row.lo, row.hi) == (n, n, 1, n)


def test_global_rank_desc_string_and_null_keys(spark):
    """Exercise the boundary predicate's desc branch on strings and
    Spark's default null placement (asc = nulls first, desc = nulls
    last) — the literal-boundary comparison must agree with the sort."""
    rnd = random.Random(23)
    words = ["ash", "birch", "cedar", "oak", "pine", None]
    rows = [(i, rnd.choice(words)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w string")

    def keyfn(t, desc):
        # desc: non-null first (reverse alpha), nulls last; asc: nulls first
        if desc:
            return ((t[1] is None, "" if t[1] is None else _neg(t[1])), t[0])
        return ((t[1] is not None, t[1] or ""), t[0])

    def _neg(s):
        return tuple(-ord(c) for c in s)

    for direction, desc in (("asc", False), ("desc", True)):
        got = {
            r.id: r.rank
            for r in global_rank(
                df, [("w", direction), ("id", "asc")], n_parts=5
            ).collect()
        }
        want = {
            t[0]: i + 1
            for i, t in enumerate(sorted(rows, key=lambda t: keyfn(t, desc)))
        }
        assert got == want, direction


def test_source_percentiles_match_numpy(spark):
    got = {r.source: r for r in source_percentiles(_docs(spark)).collect()}
    pdf = _docs(spark).select("source", "n_chars").toPandas()
    for src, grp in pdf.groupby("source"):
        vals = grp["n_chars"].to_numpy(dtype=np.float64)
        row = got[src]
        assert row.n_docs == len(vals)
        assert row.total_chars == int(vals.sum())
        for name, p in [("p25", 25), ("p50", 50), ("p90", 90), ("p99", 99)]:
            want = round(float(np.percentile(vals, p)), 6)
            assert abs(getattr(row, name) - want) < 1e-6, (src, name)


def test_length_batches_contract(spark):
    docs = _docs(spark)
    n = docs.count()
    out = sorted(length_batches(docs, batch_size=32).collect())
    assert sum(r.n_docs for r in out) == n
    # every batch full except possibly the last
    for r in out[:-1]:
        assert r.n_docs == 32
    assert out[-1].n_docs == n - 32 * (len(out) - 1)
    ids = [r.batch_id for r in out]
    assert ids == list(range(len(out)))
    for r in out:
        assert r.min_chars <= r.max_chars
        assert r.pad_waste == r.max_chars * r.n_docs - r.sum_chars
        assert r.pad_waste >= 0
    # batches are length-contiguous: each batch's max <= next batch's min
    for a, b in zip(out, out[1:]):
        assert a.max_chars <= b.min_chars


def test_length_batching_cuts_padding_vs_random_order(spark):
    """The point of the operator: length-sorted batches waste (usually
    far) fewer pad chars than id-ordered batches of the same size."""
    docs = _docs(spark)
    sorted_waste = (
        length_batches(docs, batch_size=32)
        .agg(F.sum("pad_waste"))
        .collect()[0][0]
    )
    pdf = docs.select("doc_id", "n_chars").toPandas().sort_values("doc_id")
    arr = pdf["n_chars"].to_numpy()
    random_waste = sum(
        int(arr[i : i + 32].max()) * len(arr[i : i + 32])
        - int(arr[i : i + 32].sum())
        for i in range(0, len(arr), 32)
    )
    assert sorted_waste < random_waste


def test_boilerplate_plans_agree(spark):
    """plan='broadcast_mark' (freq-filter to boilerplate types, broadcast
    LEFT-mark, no gram-keyed join) is row-identical to the default
    gram-join plan; unknown plans are rejected."""
    from noaa_oracle_spark.pipeline.text import boilerplate_ngram_stats

    docs = _docs(spark)
    a = sorted(
        map(tuple, boilerplate_ngram_stats(docs, min_docs=3).collect())
    )
    b = sorted(
        map(
            tuple,
            boilerplate_ngram_stats(
                docs, min_docs=3, plan="broadcast_mark"
            ).collect(),
        )
    )
    assert a == b and len(a) > 0
    with pytest.raises(ValueError):
        boilerplate_ngram_stats(docs, plan="nope")


def test_boilerplate_adaptive_picks_by_type_count(spark):
    """plan='adaptive' (r6 verdict ask #7): a 1-row count of the
    boilerplate-type set picks 'broadcast_mark' when it fits the budget
    and 'join' when it does not — same rows either way.  The two plans
    are told apart by join TYPE, not strategy (AQE broadcasts the tiny
    fixture's inner join too): broadcast_mark is a LEFT mark join on the
    filtered type set; the join plan is a plain INNER gram join."""
    from noaa_oracle_spark.pipeline.text import boilerplate_ngram_stats

    docs = _docs(spark)
    want = sorted(
        map(tuple, boilerplate_ngram_stats(docs, min_docs=3).collect())
    )
    small = boilerplate_ngram_stats(docs, min_docs=3, plan="adaptive")
    big = boilerplate_ngram_stats(
        docs, min_docs=3, plan="adaptive", adaptive_broadcast_rows=0
    )
    small_plan = small._jdf.queryExecution().optimizedPlan().toString()
    big_plan = big._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftOuter" in small_plan and "Inner" not in small_plan
    assert "Inner" in big_plan and "LeftOuter" not in big_plan
    assert sorted(map(tuple, small.collect())) == want
    assert sorted(map(tuple, big.collect())) == want


# ------------------------------------------------------------- classifier


def test_classifier_label_is_exact_integer_boundary(spark):
    out = quality_classifier(_docs(spark)).collect()
    assert len(out) == _docs(spark).count()
    for r in out:
        assert r.keep == (1 if r.z_milli >= 0 else 0)
        assert 0.0 < r.quality_prob < 1.0
        # sigmoid consistency at 6 dp
        want = round(1.0 / (1.0 + np.exp(-r.z_milli / 1000.0)), 6)
        assert abs(r.quality_prob - want) < 1e-6


def test_classifier_feature_directions(spark):
    rows = [
        # long, stopword-rich prose -> keep
        (1, ("the and is of a " * 30).strip()),
        # short digit spam -> drop
        (2, "12345 67890 11111"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in quality_classifier(df).collect()}
    assert got[1].keep == 1
    assert got[2].keep == 0
    assert got[1].quality_prob > got[2].quality_prob


def test_classifier_weight_injection(spark):
    df = spark.createDataFrame([(1, "plain words here")], "doc_id long, text string")
    base = quality_classifier(df).collect()[0]
    bumped = quality_classifier(df, weights={"bias": 10000}).collect()[0]
    assert bumped.z_milli == base.z_milli + 12000  # -2000 -> +10000
    assert bumped.keep == 1


# ----------------------------------------------------------- ivfpq rerank


@pytest.fixture(scope="module")
def rerank_setup(spark):
    from noaa_oracle_spark.pipeline.pq import pq_train

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_train(emb, m=8, k=8, iters=0)
    cells = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < 5)
    return emb, books, cells, q


def test_rerank_candidates_come_from_the_index(spark, rerank_setup):
    from noaa_oracle_spark.pipeline.pq import ivfpq_knn, ivfpq_rerank

    emb, books, cells, q = rerank_setup
    cand = {
        (r.q_id, r.n_id)
        for r in ivfpq_knn(q, emb, books, cells, k=10, nprobe=2).collect()
    }
    got = ivfpq_rerank(q, emb, books, cells, k=3, rerank=10, nprobe=2).collect()
    assert {(r.q_id, r.n_id) for r in got} <= cand
    # rank contract: per query 1..3, cosine desc with id-asc ties
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r.cos_sim, r.n_id) for r in rows]
        assert keys == sorted(keys)


def test_rerank_recall_at_least_matches_plain_ivfpq(spark, rerank_setup):
    """Exact re-ranking can only fix in-list ordering errors, never add
    misses — recall@3 vs brute force must be >= plain IVF-PQ@3 (measured
    on the sf0.001 embeddings: rerank strictly improves it)."""
    from noaa_oracle_spark.pipeline.pq import ivfpq_knn, ivfpq_rerank
    from noaa_oracle_spark.pipeline.similarity import brute_force_knn

    emb, books, cells, q = rerank_setup
    truth = {
        (r.q_id, r.n_id)
        for r in brute_force_knn(q, emb, k=3).collect()
    }
    plain = {
        (r.q_id, r.n_id)
        for r in ivfpq_knn(q, emb, books, cells, k=3, nprobe=2).collect()
    }
    rer = {
        (r.q_id, r.n_id)
        for r in ivfpq_rerank(q, emb, books, cells, k=3, rerank=10, nprobe=2).collect()
    }
    assert len(rer & truth) >= len(plain & truth)


# -------------------------------------------------- perplexity bucketing


def test_perplexity_buckets_contract(spark):
    """Equal-population cut (±1 doc), exhaustive over scored docs, and
    ORDER-CONSISTENT: every head logprob >= every middle >= every tail
    (ties across a boundary are legal only at equal rounded score)."""
    from noaa_oracle_spark.pipeline.text import perplexity_buckets

    docs = _docs(spark)
    rows = perplexity_buckets(docs).collect()
    n = docs.count()
    assert len(rows) == n  # every doc scored and bucketed exactly once
    by = {}
    for r in rows:
        by.setdefault(r.ppl_bucket, []).append(r.logprob)
    assert set(by) == {"head", "middle", "tail"}
    sizes = {k: len(v) for k, v in by.items()}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert min(by["head"]) >= max(by["middle"]) - 1e-12
    assert min(by["middle"]) >= max(by["tail"]) - 1e-12


def test_perplexity_buckets_custom_labels(spark):
    from noaa_oracle_spark.pipeline.text import perplexity_buckets

    rows = perplexity_buckets(
        _docs(spark), labels=("keep", "drop")
    ).collect()
    sizes = {}
    for r in rows:
        sizes[r.ppl_bucket] = sizes.get(r.ppl_bucket, 0) + 1
    assert set(sizes) == {"keep", "drop"}
    assert abs(sizes["keep"] - sizes["drop"]) <= 1


# ------------------------------------------------------------ hash split


def test_hash_split_partition_and_determinism(spark):
    """Splits are disjoint + exhaustive, deterministic across runs, and
    sized near the requested fractions."""
    from noaa_oracle_spark.pipeline.sampling import hash_split

    docs = _docs(spark)
    a = hash_split(docs, "doc_id").select("doc_id", "split").collect()
    b = hash_split(docs, "doc_id").select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n = docs.count()
    assert len(a) == n  # withColumn: no row gained or lost
    sizes = {}
    for _, s in map(tuple, a):
        sizes[s] = sizes.get(s, 0) + 1
    assert set(sizes) == {"train", "val", "test"}
    assert abs(sizes["train"] / n - 0.8) < 0.1
    assert abs(sizes["val"] / n - 0.1) < 0.06
    assert abs(sizes["test"] / n - 0.1) < 0.06


def test_hash_split_boundary_stability(spark):
    """Growing train 0.8→0.9 at val's expense moves ONLY former val rows
    into train: test membership is untouched and no train row leaves —
    the reassignment-stability contract the docstring promises."""
    from noaa_oracle_spark.pipeline.sampling import hash_split

    docs = _docs(spark)

    def assign(splits):
        return {
            r.doc_id: r.split
            for r in hash_split(docs, "doc_id", splits=splits).collect()
        }

    base = assign((("train", 0.8), ("val", 0.1), ("test", 0.1)))
    grown = assign((("train", 0.9), ("val", 0.05), ("test", 0.05)))
    for k, s in base.items():
        if s == "train":
            assert grown[k] == "train"
        if s == "test":
            assert grown[k] in ("test", "val")  # only boundaries moved


def test_hash_split_validation(spark):
    from noaa_oracle_spark.pipeline.sampling import hash_split

    docs = _docs(spark)
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", splits=(("all", 1.0),))
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", splits=(("a", 0.7), ("b", 0.2)))


def test_classifier_rejects_unknown_weight_keys(spark):
    """A typoed weight key would silently leave the real weight at its
    default — rejected loudly instead."""
    with pytest.raises(ValueError, match="unknown weight"):
        quality_classifier(_docs(spark), weights={"stop_permile": 20})
