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
_CURRENT_ROUND = 12

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
    # rewritten this round (window rule 1): q109's query side was
    # restructured in the r12 optimization round (filter-before-rotate +
    # vectorized rotation kernel), so it re-enters the window at the
    # front and its ledger hash is refreshed in the same commit; the
    # displaced fill q20_ann_cosine (last green r10, exactly at the
    # 2-round budget at end of r12) moves to the r13 lead list below.
    # q136_bm25_merge's gate body was likewise edited this round (the
    # two shard builds now run as concurrent jobs, guide §2.6), so it
    # re-enters the window at the front too, displacing the fill
    # q19_simhash (last green r10, exactly at the 2-round budget at end
    # of r12) to the r13 lead list.
    "q109_opq_knn", "q136_bm25_merge",
    # last graded in r9 — these 38 reach the 2-round staleness budget at
    # end of r12; the staleness test forces them to lead the r12 window
    # (pre-planned in the r11 window comment, r11 verdict ask #1).
    "q26_sessionization", "q27_lsh_ann", "q28_latest_limit",
    "q29_embedding_dedup", "q30_ivf_ann", "q31_rollup_subtotals",
    "q32_set_ops", "q101_ivfpq_knn", "q102_pack_bins",
    "q103_corpus_pipeline", "q104_ivfpq_residual", "q105_redact_pii",
    "q106_bigram_logprob", "q107_sq8_knn", "q108_webdataset_manifest",
    "q110_mp4_demux", "q111_bpe_pairs", "q112_mp3_manifest",
    "q113_zipf_slope", "q114_vocab_coverage", "q115_dup_cluster_stats",
    "q116_ivfpq_rerank", "q117_quality_classifier",
    "q118_source_percentiles", "q119_length_batches",
    "q120_perplexity_buckets", "q121_hash_split", "q122_kmv_distinct",
    "q123_kmv_source_overlap", "q124_countmin_heavy_hitters",
    "q125_matryoshka_knn", "q126_epoch_upsample", "q127_training_mix",
    "q128_wav_features", "q129_bm25_retrieval", "q130_crawl_urls",
    "q131_robots_filter", "q132_warc_cdx_manifest",
    # r12 debuts — staged through round 11 in PIPELINE_QUERIES_STAGED_R12
    # (oracle-green at sf0.001/sf0.01 all round, tests/test_staged_r12.py),
    # promoted to the main dicts this round (r11 verdict ask #1).
    "q139_pq_compaction", "q140_versioned_sink_lifecycle",
    # fill: the 8 numerically-oldest r10-graded names (q20_ann_cosine /
    # q19_simhash displaced by the q109 / q136 re-grades above).
    # r13 WINDOW PLAN
    # (r11 verdict ask #7): the remaining 40 r10-graded names reach the
    # 2-round staleness budget at end of r13 and MUST lead the r13
    # window —
    # q21_quality_scores q22_language_id q33_distinct_aggregates
    # q34_asof_join q35_percentiles q36_range_join q37_session_window
    # q38_dedup_components q39_moving_aggregates q40_ranking q41_pivot
    # q42_json_extract q46_winnowing q48_stratified_sample
    # q56_time_weighted_avg q63_repetition_filter q64_boilerplate_ngrams
    # q66_ppjoin_jaccard q68_important_parts q70_small_qty_revenue
    # q71_large_orders q72_disjunctive_revenue q73_promo_part_suppliers
    # q74_dormant_customers q75_grouping_sets q76_distribution_windows
    # q87_kmeans_clusters q88_kmeans_centroid_update q89_span_dedup
    # q90_weighted_sample q91_unigram_logprob q92_chunk_documents
    # q93_source_quota q99_pack_sequences q100_pq_adc_knn q20_ann_cosine
    # q133_hybrid_rrf q134_politeness_schedule q135_crawl_frontier
    # q19_simhash
    # (40 names — q136_bm25_merge left the list when its r12 re-grade
    # pulled it into this round's window; q19_simhash joined it when
    # displaced) — then the ONE staged r13 debut q141_codebook_drift
    # (PIPELINE_QUERIES_STAGED_R13, oracle-green at sf0.001/sf0.01 in
    # tests/test_staged_r13.py; budget 141 gates, under the ~150
    # ceiling); the remaining 9 slots fill with the numerically-oldest
    # r11-graded names: q02_latest_event q03_distinct_dim
    # q04_pricing_summary q05_entry_counts q06_full_outer_precip
    # q09_argmax_dedup q10_carry_forward q11_magnus_humidity
    # q13_union_by_name.  40 + 1 debut + 9 fills = one 50-slot window
    # exactly.
    "q01_daily_rollup", "q07_event_chains", "q08_topk_customers",
    "q12_regex_classify", "q15_scoring_kernel", "q16_dedup_exact",
    "q17_ngram_jaccard", "q18_minhash_lsh",
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
