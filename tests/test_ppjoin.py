"""PPJoin prefix-filtered Jaccard == inverted-index Jaccard, on the driver
corpus and on an adversarial hot-shingle corpus (shared boilerplate) where
prefix filtering is the operator that actually scales."""

from __future__ import annotations

import pytest

from noaa_oracle_spark.pipeline.dedup import (
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_ppjoin,
)

from tests.conftest import SF_DIR


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_ppjoin_equals_inverted_index_on_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert _norm(ngram_jaccard_pairs_ppjoin(docs)) == _norm(
        ngram_jaccard_pairs(docs)
    )


@pytest.mark.parametrize("num,den", [(1, 2), (4, 5), (1, 4)])
def test_ppjoin_equals_inverted_index_hot_shingles(spark, num, den):
    """Every doc shares the same boilerplate prefix (a hot shingle set that
    explodes a naive inverted index quadratically); unique tails separate
    near-dups from the rest. Equality must hold at several thresholds."""
    boiler = "terms of service apply to all users of this site"
    rows = []
    for i in range(60):
        tail = f"doc {i} unique content token{i} alpha beta gamma"
        if i % 3 == 0:
            # near-duplicate of doc i-1's shape: same tail, one word changed
            tail = f"doc {i} unique content token{max(0, i - 1)} alpha beta gamma"
        rows.append((i, f"{boiler} {tail}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert _norm(
        ngram_jaccard_pairs_ppjoin(docs, threshold_num=num, threshold_den=den)
    ) == _norm(
        ngram_jaccard_pairs(docs, threshold_num=num, threshold_den=den)
    )
