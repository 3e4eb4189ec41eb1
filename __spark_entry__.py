"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's declared inventory (SURVEY.md §2
re-expressed over the driver testdata + the training-data-pipeline
operators); ``oracle_sql()`` the matching DuckDB SQL. Implementations
live in ``data_engineer_task_spark/`` — this file is only the contract
surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineer_task_spark.plans.analytics import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the 5-table star join (lineitem ⋈ orders ⋈
    broadcast dims) with grouped revenue — the plan shape the engine is
    built around."""
    return QUERIES["revenue_by_nation"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 queries() entries
# per round. Rounds 1-3 drove 148 distinct entries (147 green); round
# 4 leads with the one red row (user_survival_km — rebuilt as an
# IEEE-exact in-row product fold, VERDICT r3 next-2) and rotates 49
# never-driver-checked entries in: the ext24 trio first (newest code,
# highest divergence risk), then the r1-era SQL-surface family and
# the ext5-ext13 applied-stats/curation rows (VERDICT r3 next-3).
# Registration order in plans/ is unchanged — only this contract
# surface reorders. Residue after this window: 22 never-checked
# entries (simple integer/string SQL rows), queued for window 5.
# Window-5 staging (rotate these in next round): the 31 entries never
# yet driver-checked after window 4 — audience_overlap_matrix,
# brand_metric_unpivot, brand_type_listing, corpus_dedup_savings,
# customer_l_diversity, customer_page_two, customers_no_urgent_notin,
# doc_bigram_counts, doc_curriculum_buckets, doc_frequent_long_tokens,
# doc_leading_tokens, doc_normalization_profile, doc_token_entropy,
# embedding_matryoshka_truncation, event_path_trigrams,
# events_null_profile, fd_violation_audit,
# full_priority_coverage_customers, hourly_event_spine_filled,
# open_order_aging_buckets, order_due_calendar, orders_vs_global_avg,
# orders_zorder_locality, purchase_click_user_recon,
# ship_calendar_profile, sliding_event_counts,
# source_lang_nullsafe_recon, split_leakage_audit,
# suppliers_with_orders_exists, user_event_locf_fill,
# user_funnel_counts — plus any entries new in round 5.
_WINDOW_PRIORITY = [
    # red row r3, re-nominated after the transcendental-free rebuild
    "user_survival_km",
    # ext24 trio (never checked; DSIR has quantized-libm membership)
    "embedding_semantic_dup_pairs",
    "embedding_semantic_dedup_survivors",
    "doc_dsir_importance_sample",
    # newest r4 code: integer-exact PCA power method, ranking AUC,
    # and the KMV sketch pair (push the three pure-SQL tail rows —
    # corpus_dedup_savings, doc_token_entropy, orders_zorder_locality —
    # to window 5)
    "embedding_pca_top_component",
    "doc_quality_score_auc",
    "event_kmv_user_days",
    "audience_kmv_jaccard",
    "embedding_pq_adc_topk",
    "embedding_ivfpq_topk",
    "customer_bloom_prefilter",
    "price_histogram_quantiles",
    "doc_bpe_phrase_merges",
    "quantity_shape_moments",
    # SQL-surface family (VERDICT r3 next-3 named rows)
    "segment_acctbal_ranks",
    "order_priority_status_cube",
    "lateral_top_suppliers",
    "event_props_variant_hist",
    "source_lang_map_roundtrip",
    "custkey_ancestry_depths",
    "order_modern_sql_surface",
    # analytics_ext residue
    "bulky_orders_vs_customer_avg",
    "part_name_fuzzy_neighbors",
    "event_value_anomalies",
    "user_weekly_retention",
    "customer_rfm_segments",
    "purchase_click_cogroup_stats",
    # ext2 profiling
    "doc_repetition_profile",
    "corpus_zipf_curve",
    "event_transition_matrix",
    # applied stats / curation (ext3-ext16)
    "priority_price_trend",
    "event_user_bitmap_distinct",
    "doc_denylist_scrub",
    "part_skyline_frontier",
    "orders_incremental_agg_merge",
    "priority_customer_multiset",
    "orders_partition_checksums",
    "part_abc_classification",
    "event_segment_pit_join",
    "brand_basket_rules",
    "customer_supplier_grid_join",
    "signup_purchase_latency",
    "brand_copurchase_triangles",
    # newest code this round — the declared two-phase CC escalation
    # path (event_path_trigrams, pure string/count SQL, waits for
    # window 5)
    "near_dup_clusters_twophase",
    "region_budget_allocation",
    "customer_revenue_waterfall",
    "customer_segment_mode_imputation",
    "brand_price_index_laspeyres",
    "user_burstiness_profile",
    "brand_top_parts_with_ties",
    # training-data pipeline rows (ext19-ext22)
    "doc_shard_assignment",
    "doc_curriculum_buckets",
    "embedding_matryoshka_truncation",
    "customer_l_diversity",
    "fd_violation_audit",
    "audience_overlap_matrix",
    "split_leakage_audit",
    "corpus_dedup_savings",
    "doc_token_entropy",
    "orders_zorder_locality",
]


def _window_order(d: dict) -> dict:
    head = {n: d[n] for n in _WINDOW_PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _window_order(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _window_order(dict(ORACLE))
