"""Incremental corpus statistics: batched refresh equals one-shot, folding
is idempotent, and maintained-state scoring matches the batch operator."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from noaa_oracle_spark.incremental.corpus_stats import CorpusStatsStore
from noaa_oracle_spark.pipeline.text import unigram_logprob

TEXTS = [
    "alpha beta gamma alpha",
    "beta beta delta",
    "gamma delta epsilon zeta",
    "alpha zeta zeta",
]


def _write(corpus_dir, name, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in rows], pa.int64()),
            "text": [t for _, t in rows],
        }
    )
    pq.write_table(tbl, os.path.join(corpus_dir, f"{name}.parquet"))


@pytest.fixture()
def corpus(tmp_path):
    d = str(tmp_path / "corpus")
    os.makedirs(d)
    _write(d, "b1", list(enumerate(TEXTS[:2])))
    _write(d, "b2", list(enumerate(TEXTS[2:], start=2)))
    return d


def test_two_batch_refresh_equals_one_shot(spark, corpus, tmp_path):
    store = CorpusStatsStore(str(tmp_path / "state"))
    # fold b1 only (remove b2 temporarily), then fold b2
    b2 = os.path.join(corpus, "b2.parquet")
    moved = b2 + ".hold"
    os.rename(b2, moved)
    assert store.refresh(spark, corpus) == 1
    os.rename(moved, b2)
    assert store.refresh(spark, corpus) == 1
    assert store.refresh(spark, corpus) == 0  # idempotent

    got = {
        r.term: (r.tf, r.df) for r in store.term_stats(spark).collect()
    }
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    want = {
        r.term: (r.tf, r.df)
        for r in words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df"))
        .collect()
    }
    assert got == want
    assert store.totals() == (4, sum(len(t.split()) for t in TEXTS))


def test_scoring_matches_batch_operator(spark, corpus, tmp_path):
    store = CorpusStatsStore(str(tmp_path / "state"))
    store.refresh(spark, corpus)
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    batch = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    incr = {
        r.doc_id: r
        for r in store.score_unigram_logprob(spark, docs).collect()
    }
    assert set(batch) == set(incr)
    for i in batch:
        assert incr[i].n_tokens == batch[i].n_tokens
        assert incr[i].logprob == pytest.approx(batch[i].logprob, abs=2e-6)


def test_unseen_terms_score_finitely(spark, corpus, tmp_path):
    store = CorpusStatsStore(str(tmp_path / "state"))
    store.refresh(spark, corpus)
    new = spark.createDataFrame(
        [(99, "omega omega alpha")], "doc_id long, text string"
    )
    out = store.score_unigram_logprob(spark, new).collect()[0]
    assert out.n_tokens == 3
    assert out.logprob is not None and out.logprob < 0
