"""BPE tokenizer-training primitives: pair counting and the
driver-coordinated merge loop (Sennrich et al. ACL 2016)."""

from __future__ import annotations

import pytest

from noaa_oracle_spark.pipeline.text import (
    bpe_pair_counts,
    bpe_train,
    word_frequencies,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # the paper's canonical shape: frequent stems sharing affixes
    rows = [
        (0, "low low low low low"),
        (1, "lower lower newest newest"),
        (2, "newest newest newest newest widest"),
        (3, "widest widest low"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_frequencies(spark, corpus):
    got = {r.w: r.n_w for r in word_frequencies(corpus).collect()}
    assert got == {"low": 6, "lower": 2, "newest": 6, "widest": 3}


def test_pair_counts_match_python(spark, corpus):
    from collections import Counter

    want: Counter = Counter()
    for w, n in [("low", 6), ("lower", 2), ("newest", 6), ("widest", 3)]:
        for a, b in zip(w, w[1:]):
            want[(a, b)] += n
    got = {
        (r.left_sym, r.right_sym): r.pair_count
        for r in bpe_pair_counts(corpus).collect()
    }
    assert got == dict(want)


def test_bpe_train_merges_and_vocab(spark, corpus):
    merges, vocab = bpe_train(corpus, n_merges=4)
    # round 1: 'es' (9 = newest 6 + widest 3) and 'st' tie at 9;
    # deterministic tiebreak is lexicographic → ('e','s') first, after
    # which round 2's top is ('es','t') at 9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    syms = {r.w: list(r.syms) for r in vocab.collect()}
    assert syms["newest"][-1] == "est" or "est" in syms["newest"]
    # every word's symbols still concatenate back to the word
    for w, s in syms.items():
        assert "".join(s) == w
    # determinism: same corpus, same merges
    merges2, _ = bpe_train(corpus, n_merges=4)
    assert merges2 == merges


def test_bpe_train_stops_when_fully_merged(spark):
    df = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    merges, vocab = bpe_train(df, n_merges=10)
    assert merges == [("a", "b")]  # one possible merge, then no pairs
    assert [list(r.syms) for r in vocab.collect()] == [["ab"]]


def test_bpe_apply_replays_training(spark, corpus):
    """Applying the learned merges tokenizes training words to their
    final training symbols (apply == train replay on seen words), and
    token streams concatenate back to the original text."""
    from noaa_oracle_spark.pipeline.text import bpe_apply

    merges, vocab = bpe_train(corpus, n_merges=6)
    trained = {r.w: list(r.syms) for r in vocab.collect()}
    toks = {
        r.doc_id: list(r.tokens)
        for r in bpe_apply(corpus, merges).collect()
    }
    rows = {r[0]: r[1] for r in corpus.collect()}
    for doc_id, text in rows.items():
        want: list = []
        for w in text.split():
            want.extend(trained[w])
        assert toks[doc_id] == want
        assert "".join(toks[doc_id]) == text.replace(" ", "")


def test_bpe_apply_handles_unseen_words(spark, corpus):
    from noaa_oracle_spark.pipeline.text import bpe_apply

    merges, _ = bpe_train(corpus, n_merges=4)
    new = spark.createDataFrame(
        [(99, "lowest newish x")], "doc_id long, text string"
    )
    row = bpe_apply(new, merges).collect()[0]
    assert "".join(row.tokens) == "lowestnewishx"
    assert row.n_tokens == len(row.tokens)
    # merges learned on 'newest'/'lowest' families still apply to the
    # shared prefixes of unseen words
    assert any(len(t) > 1 for t in row.tokens)


def test_ranked_word_frequencies_two_pass_rank(spark, corpus):
    """The shared rank kernel (zipf_slope / vocab_coverage): global rank
    equals the naive (count desc, word asc) order, computed WITHOUT an
    empty-partition window (plan asserted)."""
    from noaa_oracle_spark.pipeline.text import ranked_word_frequencies

    df = ranked_word_frequencies(corpus, n_parts=4)
    got = {r.w: (r.n_w, r.rank) for r in df.collect()}
    want_order = sorted(got.items(), key=lambda kv: (-kv[1][0], kv[0]))
    for expect_rank, (w, (_, rank)) in enumerate(want_order, start=1):
        assert rank == expect_rank, (w, rank, expect_rank)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the within-bucket window partitions by _bucket (the r7 literal-
    # boundary kernel's pure-function-of-the-row bucket) — never a
    # global window
    assert "Window" not in plan or "_bucket" in plan


def test_vocab_coverage_matches_python(spark, corpus):
    from noaa_oracle_spark.pipeline.text import vocab_coverage

    row = vocab_coverage(corpus, top_k=2).collect()[0]
    # vocab: low 6, newest 6, lower 2, widest 3 → top-2 = (low, newest)
    assert row.vocab_size == 2
    assert row.covered_tokens == 12 and row.total_tokens == 17
    assert row.oov_permille == (17 - 12) * 1000 // 17
