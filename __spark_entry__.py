"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in noaa_oracle_spark/suite.py (SURVEY §2 operator
families) and noaa_oracle_spark/suite_pipeline.py (training-data pipeline
operators); this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from noaa_oracle_spark.suite import ORACLE_SQL, QUERIES, q01_daily_rollup  # noqa: E402
from noaa_oracle_spark.suite_pipeline import (  # noqa: E402
    PIPELINE_ORACLE_SQL,
    PIPELINE_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q01_daily_rollup(spark, "/root/testdata/sf0.001")


#: Round currently being built; bump every round.  Used by the staleness
#: invariant test (tests/test_entry_contract.py) to enforce the window
#: rotation policy below.
_CURRENT_ROUND = 6

#: The driver grades only the FIRST 50 entries of queries() in insertion
#: order (round-1 judge finding).  Rotation policy (r4 verdict ask #9,
#: unit-tested against the committed CORRECTNESS_r0N.json records):
#:   1. queries with no green driver row yet (new this round) and names
#:      whose implementation was rewritten go at the FRONT;
#:   2. no name may ever end a round more than 2 rounds stale — any name
#:      whose last green row is older than _CURRENT_ROUND - 2 MUST be in
#:      this window;
#:   3. remaining slots fill with the oldest-graded names.
_GRADE_FIRST = [
    # last graded in r3 — three rounds stale at end of r6 unless graded
    # now; the staleness test forces these to lead (r5 verdict ask #1).
    "q67_min_cost_supplier", "q69_top_supplier",
    "q94_embedding_dedup_blocked", "q95_decontamination_bloom",
    "q96_semantic_dedup", "q97_exact_substring_spans",
    "q98_source_mix_weights",
    # modified AFTER their last (r4) driver grade — locally mirror-green
    # but the driver record predates the code (r5 verdict "what's wrong"
    # #1; this class of drift is now machine-caught by
    # tests/test_entry_contract.py::test_no_query_modified_since_grade
    # against GRADE_HASHES.json).
    "q106_bigram_logprob", "q107_sq8_knn",
    # new this round (r6) — grade in their first round
    "q108_webdataset_manifest", "q109_opq_knn", "q110_mp4_demux",
    "q111_bpe_pairs", "q112_mp3_manifest", "q113_zipf_slope",
    "q114_vocab_coverage", "q115_dup_cluster_stats",
    "q116_ivfpq_rerank", "q117_quality_classifier",
    "q118_source_percentiles", "q119_length_batches",
    "q120_perplexity_buckets", "q121_hash_split",
    "q122_kmv_distinct", "q123_kmv_source_overlap",
    "q124_countmin_heavy_hitters", "q125_matryoshka_knn",
    "q126_epoch_upsample", "q127_training_mix", "q128_wav_features",
    # fill: last graded in r4 (20 of the 48 r4-only names; the 28-name
    # tail omitted to make room — q26, q27, q28, q30, q38, q42, q46,
    # q48, q56, q63, q64, q66, q68, q70, q71, q72, q73, q74, q75, q76,
    # q87, q88, q89, q90, q91, q92, q93, q99 — ends r6 exactly 2 rounds
    # stale and must lead the r7 window; the staleness test enforces
    # this).
    "q01_daily_rollup", "q07_event_chains", "q08_topk_customers",
    "q100_pq_adc_knn", "q101_ivfpq_knn", "q102_pack_bins",
    "q103_corpus_pipeline", "q104_ivfpq_residual", "q105_redact_pii",
    "q12_regex_classify", "q15_scoring_kernel", "q16_dedup_exact",
    "q17_ngram_jaccard", "q18_minhash_lsh", "q19_simhash",
    "q20_ann_cosine", "q21_quality_scores", "q22_language_id",
    "q23_fingerprint", "q24_token_counts",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + pipeline ops."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(QUERIES)
    merged.update(PIPELINE_QUERIES)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _GRADE_FIRST:
        out[name] = merged.pop(name)
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per queries() key."""
    out: dict[str, str] = {}
    out.update(ORACLE_SQL)
    out.update(PIPELINE_ORACLE_SQL)
    return out
