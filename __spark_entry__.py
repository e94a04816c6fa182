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
_CURRENT_ROUND = 11

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
    # last graded in r8 — these 37 reach the 2-round staleness budget at
    # end of r11; the staleness test forces them to lead the r11 window
    # (pre-planned in the r10 window comment, r10 verdict ask #1).
    "q23_fingerprint", "q24_token_counts", "q43_correlated_subquery",
    "q44_array_ops", "q45_unpivot", "q47_tumbling_window",
    "q49_semi_anti_join", "q50_cube_subtotals", "q51_gap_fill",
    "q52_histogram", "q53_fuzzy_match", "q54_stats_aggregates",
    "q55_string_agg", "q57_shipping_priority", "q58_region_volume",
    "q59_customer_distribution", "q60_parts_supplier", "q61_market_share",
    "q62_waiting_suppliers", "q65_nearest_station",
    "q67_min_cost_supplier", "q69_top_supplier", "q77_decontamination",
    "q78_tfidf_top_terms", "q79_source_stats", "q80_order_priority",
    "q81_revenue_filter", "q82_volume_shipping", "q83_product_profit",
    "q84_returned_items", "q85_priority_class_counts", "q86_promo_revenue",
    "q94_embedding_dedup_blocked", "q95_decontamination_bloom",
    "q96_semantic_dedup", "q97_exact_substring_spans",
    "q98_source_mix_weights",
    # r11 debuts — staged through round 10 in PIPELINE_QUERIES_STAGED_R11
    # (oracle-green at sf0.001/sf0.01 all round), promoted to the main
    # dicts this round (r10 verdict ask #1).
    "q137_bm25_compaction", "q138_crawl_http_fetcher",
    # fill: the 11 numerically-oldest r9-graded names.  r12 WINDOW PLAN
    # (r10 verdict ask #7): the remaining 38 r9-graded names reach the
    # 2-round staleness budget at end of r12 and MUST lead the r12
    # window —
    # q26_sessionization q27_lsh_ann q28_latest_limit q29_embedding_dedup
    # q30_ivf_ann q31_rollup_subtotals q32_set_ops q101_ivfpq_knn
    # q102_pack_bins q103_corpus_pipeline q104_ivfpq_residual
    # q105_redact_pii q106_bigram_logprob q107_sq8_knn
    # q108_webdataset_manifest q110_mp4_demux q111_bpe_pairs
    # q112_mp3_manifest q113_zipf_slope q114_vocab_coverage
    # q115_dup_cluster_stats q116_ivfpq_rerank q117_quality_classifier
    # q118_source_percentiles q119_length_batches q120_perplexity_buckets
    # q121_hash_split q122_kmv_distinct q123_kmv_source_overlap
    # q124_countmin_heavy_hitters q125_matryoshka_knn q126_epoch_upsample
    # q127_training_mix q128_wav_features q129_bm25_retrieval
    # q130_crawl_urls q131_robots_filter q132_warc_cdx_manifest
    # (38 names) — then any r12 debuts staged in
    # PIPELINE_QUERIES_STAGED_R12; the remaining slots fill with the
    # numerically-oldest r10-graded names (q01_daily_rollup,
    # q07_event_chains, ...).  38 + debuts + fills fits one 50-slot
    # window because this round's 11 fills below already re-graded the
    # oldest r9 overflow.
    "q02_latest_event", "q03_distinct_dim", "q04_pricing_summary",
    "q05_entry_counts", "q06_full_outer_precip", "q09_argmax_dedup",
    "q10_carry_forward", "q11_magnus_humidity", "q13_union_by_name",
    "q14_window_clamp", "q25_star_revenue",
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
