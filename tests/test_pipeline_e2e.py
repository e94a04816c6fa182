"""The training-corpus pipeline composed end-to-end, the way a real data
job would chain the operators:

    documents → quality filter → exact dedup → near-dup clustering →
    representative selection → deterministic stratified sample → token stats

Each stage is individually gate-checked elsewhere; this test pins that they
COMPOSE (schemas line up, determinism survives chaining, and each stage
only ever shrinks the corpus).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from noaa_oracle_spark.pipeline.dedup import (
    connected_components,
    exact_dedup,
    ngram_jaccard_pairs,
)
from noaa_oracle_spark.pipeline.sampling import stratified_hash_sample
from noaa_oracle_spark.pipeline.text import quality_scores, token_counts

SF_DIR = "/root/testdata/sf0.01"


def _run_pipeline(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. quality floor
    quality = quality_scores(docs).filter(F.col("quality_score") >= 60)
    survivors = docs.join(quality.select("doc_id"), "doc_id")

    # 2. exact dedup → one representative per identical text
    reps = exact_dedup(survivors).select(
        F.col("rep_doc_id").alias("doc_id")
    )
    survivors = survivors.join(reps, "doc_id")

    # 3. near-dup clustering → keep each cluster's min-id representative
    pairs = ngram_jaccard_pairs(
        survivors, threshold_num=3, threshold_den=10
    ).select("doc_a", "doc_b")
    comps = connected_components(survivors, pairs)
    survivors = survivors.join(
        comps.filter(F.col("doc_id") == F.col("component")).select("doc_id"),
        "doc_id",
    )

    # 4. deterministic stratified sample (en-heavy mix)
    sampled = stratified_hash_sample(
        survivors, "doc_id", "lang", {"en": 0.8}, default_fraction=0.5,
        salt="corpus-v1",
    )

    # 5. corpus stats
    stats = (
        token_counts(sampled)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens_bpe").alias("total_tokens"),
        )
        .first()
    )
    return docs.count(), quality.count(), survivors.count(), sampled, stats


def test_pipeline_composes_and_shrinks(spark):
    n_docs, n_quality, n_unique, sampled, stats = _run_pipeline(spark)
    n_sampled = sampled.count()
    assert n_docs >= n_quality >= n_unique >= n_sampled > 0
    assert stats.n_docs == n_sampled
    assert stats.total_tokens > 0


def test_pipeline_is_deterministic(spark):
    _, _, _, sampled1, stats1 = _run_pipeline(spark)
    _, _, _, sampled2, stats2 = _run_pipeline(spark)
    ids1 = {r.doc_id for r in sampled1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in sampled2.select("doc_id").collect()}
    assert ids1 == ids2
    assert stats1.total_tokens == stats2.total_tokens


def test_near_dedup_corpus_one_call(spark):
    """near_dedup_corpus: exact dup collapses, near-dup cluster keeps its
    min-id representative, unique docs survive verbatim."""
    from noaa_oracle_spark.pipeline.dedup import near_dedup_corpus

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    rows = [
        (1, base),
        (2, base),                      # exact duplicate of 1
        (3, near),                      # near-duplicate of 1 (1 word off)
        (4, "completely different words in this document entirely here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r.doc_id
        for r in near_dedup_corpus(
            docs, threshold_num=1, threshold_den=2
        ).collect()
    )
    assert kept == [1, 4]


def test_near_dedup_quality_representative(spark):
    """best_quality keeps the highest-quality member of each near-dup
    cluster (id tiebreak), while exact dups still collapse to min-id."""
    import pytest

    from noaa_oracle_spark.pipeline.dedup import near_dedup_corpus

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    near = base.replace("sigma", "SIGMA")  # high-Jaccard near dup
    rows = [
        (1, base, 10),
        (2, near, 99),          # near dup of 1, better quality
        (3, base, 50),          # exact dup of 1
        (4, "totally different text " * 5, 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, q long")
    by_min = {r.doc_id for r in near_dedup_corpus(df, threshold_num=7).collect()}
    assert by_min == {1, 4}
    by_q = {
        r.doc_id
        for r in near_dedup_corpus(
            df, threshold_num=7,
            representative="best_quality", quality_col="q",
        ).collect()
    }
    # exact tier keeps min-id (1 over 3, identical text); the near-dup
    # cluster {1, 2} then keeps 2 on quality
    assert by_q == {2, 4}
    with pytest.raises(ValueError, match="quality_col"):
        near_dedup_corpus(df, representative="best_quality")
    with pytest.raises(ValueError, match="policy"):
        near_dedup_corpus(df, representative="banana")


def test_redact_pii_semantics(spark):
    """Category cascade, counts-per-category, and exact replacement
    tokens; non-PII digit runs and bare words survive untouched."""
    from noaa_oracle_spark.pipeline.text import redact_pii

    rows = [
        (1, "mail a.b-c_d@ex-ample.org and e@f.io twice"),
        (2, "server 192.168.1.254 and 8.8.8.8 up"),
        (3, "card 4111111111111111 paid"),
        (4, "clean text 123 45678 no pii 1.2.3"),  # 3 octets ≠ IP
        (5, "x@y.zz from 10.0.0.1 card 1234567812345678"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (got[1].n_email, got[1].n_ip, got[1].n_card) == (2, 0, 0)
    assert got[1].clean_text == "mail <EMAIL> and <EMAIL> twice"
    assert (got[2].n_email, got[2].n_ip) == (0, 2)
    assert got[2].clean_text == "server <IP> and <IP> up"
    assert got[3].n_card == 1
    assert got[3].clean_text == "card <CARD> paid"
    assert (got[4].n_email, got[4].n_ip, got[4].n_card) == (0, 0, 0)
    assert got[4].clean_text == rows[3][1]
    assert (got[5].n_email, got[5].n_ip, got[5].n_card) == (1, 1, 1)
    assert got[5].clean_text == "<EMAIL> from <IP> card <CARD>"


def test_bigram_logprob_semantics(spark):
    """Hand-checked interpolation on a tiny corpus + short-doc absence."""
    import math

    from noaa_oracle_spark.pipeline.text import bigram_logprob

    rows = [(1, "a b a b"), (2, "a b"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_logprob(df).collect()}
    assert 3 not in got  # <2 tokens → absent (left-join convention)
    # corpus: tokens a,b,a,b,a,b,x → N=7, C(a)=3, C(b)=3, C(x)=1
    # bigrams: doc1 (a,b),(b,a),(a,b); doc2 (a,b) → C(ab)=4? no:
    # doc1 contributes ab, ba, ab; doc2 ab → C(ab)=3, C(ba)=1
    N = 7.0
    p_ab = 0.7 * (3 / 3) + 0.3 * (3 / N)
    p_ba = 0.7 * (1 / 3) + 0.3 * (3 / N)
    exp1 = round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)
    exp2 = round(math.log(p_ab), 6)
    assert got[1].n_bigrams == 3 and got[1].logprob == exp1
    assert got[2].n_bigrams == 1 and got[2].logprob == exp2
