"""Unit tests for the mergeable-sketch tier (pipeline/sketches.py): KMV
distinct-count estimation, KMV pairwise overlap, and the count-min
sketch.  Every sketch is md5-deterministic, so the tests can assert
EXACT equality against brute-force single-node reimplementations of the
estimators, plus the analytic properties (exact-below-k, CMS
overestimate, accuracy bounds) on fixed data."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.sketches import (
    countmin_cells,
    countmin_estimate,
    countmin_heavy_hitters,
    kmv_distinct,
    kmv_jaccard,
    kmv_sketches,
)

SF_DIR = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _kmv_estimate(values, k):
    hashes = sorted({_h60(v) for v in values})
    if len(hashes) < k:
        return float(len(hashes))
    return round((k - 1) * float(1 << 60) / (float(hashes[k - 1]) + 1.0), 6)


def _group_df(spark, groups):
    """groups: dict name -> iterable of element strings."""
    rows = [(g, e) for g, es in groups.items() for e in es]
    return spark.createDataFrame(rows, "g string, e string")


# ---------------------------------------------------------------- KMV


def test_kmv_exact_below_k(spark):
    df = _group_df(spark, {"a": [f"x{i}" for i in range(40)] * 3})
    rows = kmv_distinct(df, ["g"], F.col("e"), k=256).collect()
    assert len(rows) == 1
    assert rows[0].n_sketch == 40 and rows[0].kmv_distinct == 40.0


def test_kmv_matches_brute_force_formula(spark):
    rnd = random.Random(7)
    els = [f"v{rnd.randrange(10_000)}" for _ in range(6000)]
    df = _group_df(spark, {"a": els})
    row = kmv_distinct(df, ["g"], F.col("e"), k=128, n_buckets=8).collect()[0]
    want = _kmv_estimate(els, 128)
    assert row.kmv_distinct == want
    assert row.n_sketch == 128
    # accuracy: ~1/sqrt(k-2) relative error; allow 3 sigma on fixed data
    true = len(set(els))
    assert abs(row.kmv_distinct - true) / true < 3 / (126**0.5)


def test_kmv_invariant_to_bucketing_and_partitioning(spark):
    els = [f"t{i * 13 % 997}" for i in range(2500)]
    a = _group_df(spark, {"g1": els}).repartition(11)
    b = _group_df(spark, {"g1": els}).coalesce(1)
    r1 = kmv_distinct(a, ["g"], F.col("e"), k=64, n_buckets=32).collect()[0]
    r2 = kmv_distinct(b, ["g"], F.col("e"), k=64, n_buckets=3).collect()[0]
    assert (r1.n_sketch, r1.kmv_distinct) == (r2.n_sketch, r2.kmv_distinct)


def test_kmv_sketches_are_bottom_k(spark):
    els = [f"u{i}" for i in range(500)]
    df = _group_df(spark, {"a": els, "b": els[:30]})
    sk = {r.g: r.sketch for r in kmv_sketches(df, "g", F.col("e"), k=50).collect()}
    want_a = sorted({_h60(e) for e in els})[:50]
    want_b = sorted({_h60(e) for e in els[:30]})
    assert sk["a"] == want_a
    assert sk["b"] == want_b  # below k: the complete hash set


def test_kmv_jaccard_identical_and_disjoint(spark):
    shared = [f"s{i}" for i in range(800)]
    other = [f"o{i}" for i in range(800)]
    df = _group_df(spark, {"a": shared, "b": shared, "c": other})
    got = {
        (r.group_a, r.group_b): r
        for r in kmv_jaccard(df, "g", F.col("e"), k=100).collect()
    }
    assert got[("a", "b")].jaccard == 1.0
    assert got[("a", "c")].jaccard == 0.0
    assert got[("b", "c")].jaccard == 0.0
    assert got[("a", "b")].n_union_sketch == 100


def test_kmv_jaccard_matches_brute_force_union_bottom(spark):
    rnd = random.Random(3)
    a = {f"e{rnd.randrange(3000)}" for _ in range(1500)}
    b = {f"e{rnd.randrange(3000) + 1500}" for _ in range(1500)}  # overlap
    df = _group_df(spark, {"a": sorted(a), "b": sorted(b)})
    k = 120
    row = kmv_jaccard(df, "g", F.col("e"), k=k).collect()[0]
    ha, hb = {_h60(e) for e in a}, {_h60(e) for e in b}
    union_bottom = sorted(ha | hb)[:k]
    n_both = sum(1 for h in union_bottom if h in ha and h in hb)
    assert row.n_union_sketch == len(union_bottom)
    assert row.n_both == n_both
    assert row.jaccard == round(n_both / len(union_bottom), 6)
    true_j = len(a & b) / len(a | b)
    assert abs(row.jaccard - true_j) < 0.15


# ----------------------------------------------------------- count-min


def _word_counts(spark, counts):
    rows = [(t, n) for t, n in counts.items()]
    return spark.createDataFrame(rows, "term string, n long")


def test_countmin_estimate_upper_bounds_exact(spark):
    counts = {f"w{i}": (i % 17) + 1 for i in range(300)}
    cdf = _word_counts(spark, counts)
    cells = countmin_cells(cdf, count_col="n", d=4, w=64)
    est = {
        r.term: r.cms_estimate
        for r in countmin_estimate(cells, cdf.select("term"), d=4, w=64).collect()
    }
    assert set(est) == set(counts)
    assert all(est[t] >= counts[t] for t in counts)
    # 300 terms over 64 buckets: collisions are guaranteed somewhere
    assert any(est[t] > counts[t] for t in counts)


def test_countmin_no_collisions_is_exact(spark):
    counts = {f"q{i}": 10 * i + 1 for i in range(8)}
    cdf = _word_counts(spark, counts)
    cells = countmin_cells(cdf, count_col="n", d=6, w=4096)
    est = {
        r.term: r.cms_estimate
        for r in countmin_estimate(cells, cdf.select("term"), d=6, w=4096).collect()
    }
    assert est == counts  # min over 6 rows: one collision-free row suffices


def test_countmin_matches_brute_force(spark):
    counts = {f"z{i}": (i * 7) % 23 + 1 for i in range(120)}
    d, w = 3, 32
    cdf = _word_counts(spark, counts)
    cells = countmin_cells(cdf, count_col="n", d=d, w=w)
    table = {}
    for t, n in counts.items():
        for s in range(d):
            key = (s, _h60(f"{s}|{t}") % w)
            table[key] = table.get(key, 0) + n
    got_cells = {
        (r.seed, r.bucket): r.cell_count for r in cells.collect()
    }
    assert got_cells == table
    est = {
        r.term: r.cms_estimate
        for r in countmin_estimate(cells, cdf.select("term"), d=d, w=w).collect()
    }
    want = {
        t: min(table[(s, _h60(f"{s}|{t}") % w)] for s in range(d))
        for t in counts
    }
    assert est == want


def test_heavy_hitters_contract(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = countmin_heavy_hitters(docs, top_n=10, d=4, w=64).collect()
    assert len(rows) == 10
    exact = {
        r.term: r.c
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    top = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:10]
    assert {r.term for r in rows} == {t for t, _ in top}
    for r in rows:
        assert r.exact_count == exact[r.term]
        assert r.cms_estimate >= r.exact_count


def test_kmv_null_elements_are_outside_the_domain(spark):
    """NULL elements never enter a sketch (they would hash NULL and sort
    as the minimum) — estimates see only the non-null domain."""
    df = spark.createDataFrame(
        [("a", f"x{i}") for i in range(40)] + [("a", None)] * 5,
        "g string, e string",
    )
    row = kmv_distinct(df, ["g"], F.col("e"), k=64).collect()[0]
    assert (row.n_sketch, row.kmv_distinct) == (40, 40.0)
    sk = kmv_sketches(df, "g", F.col("e"), k=64).collect()[0]
    assert len(sk.sketch) == 40 and None not in sk.sketch


def test_countmin_unseen_probe_estimates_zero(spark):
    """Probing a term the sketch never counted returns the true CMS
    answer (0 when its cells are unpopulated, the collision mass
    otherwise) — never a dropped row."""
    counts = {"only": 7}
    cells = countmin_cells(
        _word_counts(spark, counts), count_col="n", d=4, w=4096
    )
    probes = spark.createDataFrame(
        [("only",), ("never-counted",)], "term string"
    )
    est = {
        r.term: r.cms_estimate
        for r in countmin_estimate(cells, probes, d=4, w=4096).collect()
    }
    assert est == {"only": 7, "never-counted": 0}


def test_sketch_parameter_validation(spark):
    df = _group_df(spark, {"a": ["x"]})
    with pytest.raises(ValueError):
        kmv_distinct(df, ["g"], F.col("e"), k=1)
    with pytest.raises(ValueError):
        kmv_sketches(df, "g", F.col("e"), k=0)
    with pytest.raises(ValueError):
        countmin_cells(_word_counts(spark, {"t": 1}), count_col="n", d=0)
    from noaa_oracle_spark.pipeline.similarity import matryoshka_knn

    with pytest.raises(ValueError):
        matryoshka_knn(df, df, d_prefix=0)


# ---------------------------------------------------------------------------
# kmv_sample / kmv_quantiles — the mergeable uniform-sample tier
# ---------------------------------------------------------------------------


def test_kmv_sample_deterministic_and_partition_invariant(spark):
    from noaa_oracle_spark.pipeline.sketches import kmv_sample

    rows = [(f"g{i % 3}", i, float(i * 7 % 101)) for i in range(2000)]
    df1 = spark.createDataFrame(rows, "g string, id long, v double")
    df2 = df1.repartition(17)
    s1 = sorted(map(tuple, kmv_sample(df1, ["g"], "id", k=50).collect()))
    s2 = sorted(
        map(tuple, kmv_sample(df2, ["g"], "id", k=50, n_buckets=7).collect())
    )
    assert s1 == s2 and len(s1) == 150
    # sample rows are real input rows
    assert set(s1) <= set(rows)


def test_kmv_sample_merge_equals_whole(spark):
    """Mergeability made executable: bottom-k over the UNION equals the
    bottom-k of the concatenated per-shard samples — per-shard samples
    union into the corpus sample without re-reading data."""
    from noaa_oracle_spark.pipeline.sketches import kmv_sample

    rows_a = [("g", i, float(i)) for i in range(0, 1500)]
    rows_b = [("g", i, float(i)) for i in range(1500, 3000)]
    a = spark.createDataFrame(rows_a, "g string, id long, v double")
    b = spark.createDataFrame(rows_b, "g string, id long, v double")
    whole = sorted(
        map(tuple, kmv_sample(a.unionAll(b), ["g"], "id", k=64).collect())
    )
    sa = kmv_sample(a, ["g"], "id", k=64)
    sb = kmv_sample(b, ["g"], "id", k=64)
    merged = sorted(
        map(tuple, kmv_sample(sa.unionAll(sb), ["g"], "id", k=64).collect())
    )
    assert merged == whole


def test_kmv_sample_below_k_returns_all_and_null_ids_excluded(spark):
    from noaa_oracle_spark.pipeline.sketches import kmv_sample

    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 2.0), ("g", None, 9.0)],
        "g string, id long, v double",
    )
    got = sorted(map(tuple, kmv_sample(df, ["g"], "id", k=10).collect()))
    assert got == [("g", 1, 1.0), ("g", 2, 2.0)]


def test_kmv_quantiles_tracks_population(spark):
    import numpy as np

    from noaa_oracle_spark.pipeline.sketches import kmv_quantiles

    n = 20000
    rows = [("g", i, float((i * 37) % 1000)) for i in range(n)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = kmv_quantiles(
        df, ["g"], "id", "v", quantiles=[0.5, 0.9], k=512
    ).collect()
    assert len(out) == 1 and out[0]["n_sample"] == 512
    vals = np.array([v for _, _, v in rows])
    # rank-space error ~ 1/sqrt(k): generous 4-sigma band in value space
    for q, col in ((0.5, "q_0_5"), (0.9, "q_0_9")):
        true = np.quantile(vals, q)
        tol = 4.0 / np.sqrt(512) * 1000  # value range is 0..999
        assert abs(out[0][col] - true) < tol, (q, out[0][col], true)


def test_kmv_quantiles_small_group_is_exact(spark):
    import numpy as np

    from noaa_oracle_spark.pipeline.sketches import kmv_quantiles

    vals = [3.0, 1.0, 4.0, 1.5, 9.0, 2.0, 6.0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "g string, id long, v double",
    )
    out = kmv_quantiles(df, ["g"], "id", "v", quantiles=[0.5], k=100).collect()
    # below k the sample IS the population: quantile_cont is exact
    assert out[0]["q_0_5"] == round(float(np.quantile(vals, 0.5)), 6)
    with pytest.raises(ValueError):
        kmv_quantiles(df, ["g"], "id", "v", quantiles=[1.5])


def test_kmv_quantiles_name_scheme_and_collision_guard(spark):
    from noaa_oracle_spark.pipeline.sketches import kmv_quantiles

    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(50)],
        "g string, id long, v double",
    )
    out = kmv_quantiles(df, ["g"], "id", "v", quantiles=[0.1, 1.0], k=100)
    # 0.1 -> q_0_1 and 1.0 -> q_1 must NOT collide (round-7 review)
    assert {"q_0_1", "q_1"} <= set(out.columns)
    row = out.collect()[0]
    assert row["q_1"] == 49.0
    with pytest.raises(ValueError):
        kmv_quantiles(df, ["g"], "id", "v", quantiles=[0.5, 0.5])
