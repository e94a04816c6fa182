"""Batch lexical serving (r10 verdict ask #4): bm25_query_batch must be
per-query identical to bm25_query (one union-term postings scan instead
of N), and rrf_fuse_batch per-query identical to rrf_fuse — the two
primitives batch /search/hybrid composes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.text import (
    bm25_query,
    bm25_query_batch,
    load_bm25_index,
    rrf_fuse,
    rrf_fuse_batch,
    save_bm25_index,
)

TEXTS = {
    1: "spark window hash join",
    2: "hash hash hash join",
    3: "window functions rank over",
    4: "totally unrelated prose here",
    5: "spark hash spark",
    6: "prose about nothing at all",
    7: "join join window",
    8: "rank rank rank rank",
}


@pytest.fixture(scope="module")
def bm25_idx(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        sorted(TEXTS.items()), "doc_id long, text string"
    )
    path = str(tmp_path_factory.mktemp("batchlex") / "idx")
    save_bm25_index(docs, path)
    return load_bm25_index(spark, path)


QUERIES = [
    ["spark", "hash"],
    ["window", "rank"],
    ["join"],
    ["hash", "hash", "spark", ""],  # dupes/empties normalize away
    ["nosuchterm", "prose"],
]


def test_bm25_query_batch_equals_singles(spark, bm25_idx):
    batch = bm25_query_batch(bm25_idx, QUERIES, k=3, k1=1.4, b=0.6)
    got: dict = {}
    for r in batch.collect():
        got.setdefault(r.q_idx, []).append((r.rnk, r.doc_id, r.bm25))
    assert set(got) == set(range(len(QUERIES)))
    for qi, terms in enumerate(QUERIES):
        want = [
            (r.rnk, r.doc_id, r.bm25)
            for r in bm25_query(
                bm25_idx, terms, k=3, k1=1.4, b=0.6
            ).collect()
        ]
        assert sorted(got[qi]) == sorted(want), (qi, terms)


def test_bm25_query_batch_scan_count_independent_of_batch_size(
    spark, bm25_idx
):
    """The point of the batch: the postings/doclens scan count is a
    property of the PLAN SHAPE, not of |Q| — 5 queries cost exactly the
    scans 1 query costs (one union-term pass), never 5× — pinned on the
    executed plan."""

    def scans(qs):
        return (
            bm25_query_batch(bm25_idx, qs, k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .count("Scan parquet")
        )

    assert scans(QUERIES) == scans(QUERIES[:1])


def test_bm25_query_batch_validation(bm25_idx):
    with pytest.raises(ValueError, match="empty query batch"):
        bm25_query_batch(bm25_idx, [], k=3)
    with pytest.raises(ValueError, match="query 1 has no"):
        bm25_query_batch(bm25_idx, [["spark"], ["", ""]], k=3)


def test_rrf_fuse_batch_equals_per_query_fuse(spark):
    rank_a = spark.createDataFrame(
        [
            (0, 10, 1), (0, 11, 2), (0, 12, 3),
            (1, 20, 1), (1, 11, 2),
        ],
        "q_idx int, doc_id long, rnk int",
    )
    rank_b = spark.createDataFrame(
        [
            (0, 11, 1), (0, 13, 2),
            (1, 20, 1), (1, 21, 2), (1, 22, 3),
        ],
        "q_idx int, doc_id long, rnk int",
    )
    fused = rrf_fuse_batch([rank_a, rank_b], k=60, topk=3)
    got: dict = {}
    for r in fused.collect():
        got.setdefault(r.q_idx, []).append(
            (r.rnk, r.doc_id, r.rrf_score)
        )
    for qi in (0, 1):
        a = rank_a.filter(F.col("q_idx") == qi).drop("q_idx")
        b = rank_b.filter(F.col("q_idx") == qi).drop("q_idx")
        want = [
            (r.rnk, r.doc_id, r.rrf_score)
            for r in rrf_fuse([a, b], k=60, topk=3).collect()
        ]
        assert sorted(got[qi]) == sorted(want), qi


def test_rrf_fuse_batch_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse_batch([])
    df = spark.createDataFrame(
        [(0, 1, 1)], "q_idx int, doc_id long, rnk int"
    )
    with pytest.raises(ValueError, match="positive"):
        rrf_fuse_batch([df], k=0)
