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
_CURRENT_ROUND = 13

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
    # The r13 window, exactly as pre-planned in the r12 window comment
    # (r11 verdict ask #7): the 40 r10-graded names reach the 2-round
    # staleness budget at end of r13 and MUST lead.
    "q21_quality_scores", "q22_language_id", "q33_distinct_aggregates",
    "q34_asof_join", "q35_percentiles", "q36_range_join",
    "q37_session_window", "q38_dedup_components", "q39_moving_aggregates",
    "q40_ranking", "q41_pivot", "q42_json_extract", "q46_winnowing",
    "q48_stratified_sample", "q56_time_weighted_avg",
    "q63_repetition_filter", "q64_boilerplate_ngrams",
    "q66_ppjoin_jaccard", "q68_important_parts", "q70_small_qty_revenue",
    "q71_large_orders", "q72_disjunctive_revenue",
    "q73_promo_part_suppliers", "q74_dormant_customers",
    "q75_grouping_sets", "q76_distribution_windows",
    "q87_kmeans_clusters", "q88_kmeans_centroid_update", "q89_span_dedup",
    "q90_weighted_sample", "q91_unigram_logprob", "q92_chunk_documents",
    "q93_source_quota", "q99_pack_sequences", "q100_pq_adc_knn",
    "q20_ann_cosine", "q133_hybrid_rrf", "q134_politeness_schedule",
    "q135_crawl_frontier", "q19_simhash",
    # the ONE r13 debut — staged through r12 in PIPELINE_QUERIES_STAGED_R13
    # (oracle-green at sf0.001/sf0.01 all round, tests/test_staged_r13.py),
    # promoted to the main dicts this round (budget 141 gates, under the
    # ~150 ceiling, r11 verdict ask #8).
    "q141_codebook_drift",
    # fill: the 9 numerically-oldest r11-graded names.
    "q02_latest_event", "q03_distinct_dim", "q04_pricing_summary",
    "q05_entry_counts", "q06_full_outer_precip", "q09_argmax_dedup",
    "q10_carry_forward", "q11_magnus_humidity", "q13_union_by_name",
    # POST-r13 STATE (final round of the engagement): after this window
    # is graded the ledger stands at 50 r13 / 50 r12 / 41 r11 — zero
    # names beyond the 2-round staleness budget at end of r13.  Were a
    # round 14 to exist, the 41 remaining r11-graded names (the r12
    # window minus its 9 fills promoted above) would lead its window.
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
