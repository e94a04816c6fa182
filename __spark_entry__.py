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
_CURRENT_ROUND = 10

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
    # r10 debuts — staged through round 9 in PIPELINE_QUERIES_STAGED_R10,
    # promoted to the main dicts this round (r9 verdict ask #1).
    "q133_hybrid_rrf", "q134_politeness_schedule", "q135_crawl_frontier",
    "q136_bm25_merge",
    # rewritten this round (r9 verdict ask #2): pq_encode's explode →
    # groupBy collect_list shuffle replaced with the map-side
    # _encode_block kernel; the two gates whose build path runs
    # pq_encode directly must be re-graded on the new plan.
    "q100_pq_adc_knn", "q109_opq_knn",
    # last graded in r7 — one round stale at end of r9; the staleness
    # test forces these 32 to lead the r10 window (r9 verdict ask #1).
    "q33_distinct_aggregates", "q34_asof_join", "q35_percentiles",
    "q36_range_join", "q37_session_window", "q38_dedup_components",
    "q39_moving_aggregates", "q40_ranking", "q41_pivot",
    "q42_json_extract", "q46_winnowing", "q48_stratified_sample",
    "q56_time_weighted_avg", "q63_repetition_filter",
    "q64_boilerplate_ngrams", "q66_ppjoin_jaccard", "q68_important_parts",
    "q70_small_qty_revenue", "q71_large_orders", "q72_disjunctive_revenue",
    "q73_promo_part_suppliers", "q74_dormant_customers",
    "q75_grouping_sets", "q76_distribution_windows", "q87_kmeans_clusters",
    "q88_kmeans_centroid_update", "q89_span_dedup", "q90_weighted_sample",
    "q91_unigram_logprob", "q92_chunk_documents", "q93_source_quota",
    "q99_pack_sequences",
    # fill: the 12 numerically-oldest r8-graded names (q100 is already
    # above as a rewrite).  r11 WINDOW PLAN (r9 verdict ask #6): the
    # remaining 37 r8-graded names reach the 2-round staleness budget at
    # end of r11 and MUST lead the r11 window —
    # q23_fingerprint q24_token_counts q43_correlated_subquery
    # q44_array_ops q45_unpivot q47_tumbling_window q49_semi_anti_join
    # q50_cube_subtotals q51_gap_fill q52_histogram q53_fuzzy_match
    # q54_stats_aggregates q55_string_agg q57_shipping_priority
    # q58_region_volume q59_customer_distribution q60_parts_supplier
    # q61_market_share q62_waiting_suppliers q65_nearest_station
    # q67_min_cost_supplier q69_top_supplier q77_decontamination
    # q78_tfidf_top_terms q79_source_stats q80_order_priority
    # q81_revenue_filter q82_volume_shipping q83_product_profit
    # q84_returned_items q85_priority_class_counts q86_promo_revenue
    # q94_embedding_dedup_blocked q95_decontamination_bloom
    # q96_semantic_dedup q97_exact_substring_spans q98_source_mix_weights
    # (37 names) — then the 2 r11 debuts staged in
    # PIPELINE_QUERIES_STAGED_R11 (built + oracle-green at
    # sf0.001/sf0.01 this round, tests/test_staged_r11.py):
    # q137_bm25_compaction q138_crawl_http_fetcher — 39 names; the
    # remaining 11 slots fill with the oldest-r9 names.
    "q01_daily_rollup", "q07_event_chains", "q08_topk_customers",
    "q12_regex_classify", "q15_scoring_kernel", "q16_dedup_exact",
    "q17_ngram_jaccard", "q18_minhash_lsh", "q19_simhash",
    "q20_ann_cosine", "q21_quality_scores", "q22_language_id",
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
