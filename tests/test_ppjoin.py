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


@pytest.mark.parametrize("num,den", [(8, 10), (4, 5)])
def test_ppjoin_positional_filter_keeps_boundary_pairs(spark, num, den):
    """r12 optimization: candidates are pruned at generation by PPJoin's
    positional filter (overlap <= min(pa,pb) + 1 + min(na-pa-1, nb-pb-1)
    for a token shared at prefix positions pa/pb).  Its tightest regime —
    where an off-by-one would silently drop TRUE pairs — is qualifying
    pairs of UNEQUAL length whose Jaccard sits just above the threshold,
    mixed with just-below decoys.  Build exactly that corpus and require
    equality with the exact inverted-index join, plus a planted pair that
    must be present (so the check is not vacuously empty == empty)."""
    base = [f"w{i}" for i in range(40)]
    rows = [
        # pair (0,1): B = A plus extra tail words -> unequal lengths,
        # J barely above 8/10 on word trigrams
        (0, " ".join(base)),
        (1, " ".join(base + ["x0", "x1"])),
        # pair (2,3): one word substituted mid-doc -> J near the line
        (2, " ".join(base)),
        (3, " ".join(base[:20] + ["sub"] + base[21:])),
        # decoys: share half the prefix vocabulary, J well below
        (4, " ".join(base[:20] + [f"y{i}" for i in range(20)])),
        (5, " ".join(base[:10] + [f"z{i}" for i in range(30)])),
        # short docs (prefix is nearly the whole doc)
        (6, "a b c d e"),
        (7, "a b c d e f"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = _norm(
        ngram_jaccard_pairs_ppjoin(docs, threshold_num=num, threshold_den=den)
    )
    assert got == _norm(
        ngram_jaccard_pairs(docs, threshold_num=num, threshold_den=den)
    )
    assert any(a == 0 and b == 1 for a, b, *_ in got)


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
