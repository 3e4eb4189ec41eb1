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
# per round. Round 1 proved the relational core (CORRECTNESS_r01.json:
# 50/50 green); this round rotates the not-yet-driver-checked
# LLM-pipeline capstones (dedup/ANN/text/streaming/curation) plus the
# two re-blocked pairwise entries into the window, including the new
# round-2 families (exact-substring segment dedup, keep-best survivor
# selection, LSH recall eval, Poisson bootstrap, Holt forecasting).
# Registration order in plans/ is unchanged — only this contract
# surface reorders.
_WINDOW_PRIORITY = [
    "doc_jaccard_join_exact",
    "embedding_ann_recall",
    "training_sample_assembly",
    "stream_user_sessions",
    "customer_linkage_scores",
    "user_journey_edit_distance",
    "doc_tfidf_cosine_pairs",
    "doc_bm25_search",
    "doc_contamination_overlap",
    "doc_quality_gate",
    "doc_language_id",
    "doc_token_cms_topk",
    "doc_weighted_sample",
    "doc_balanced_lang_sample",
    "doc_source_capped_sample",
    "doc_bigram_perplexity",
    "doc_vocab_oov_rates",
    "doc_rake_keyphrases",
    "doc_negative_pairs",
    "doc_feature_hashing",
    "doc_overlap_chunks",
    "doc_fixed_chunks_udtf",
    "doc_ngram_novelty",
    "near_dup_threshold_sweep",
    "corpus_mixture_weights",
    "incremental_near_dup",
    "doc_bigram_collocations",
    "hybrid_rrf_search",
    "embedding_kmeans_clusters",
    "embedding_ivf_topk",
    "embedding_quantization_error",
    "embedding_silhouette_by_label",
    "embedding_norm_profile",
    "stream_enriched_event_stats",
    "stream_purchase_click_outer",
    "user_session_spans",
    "customer_scd2_segments",
    "customer_golden_record",
    "customer_grid_density_clusters",
    "customer_k_anonymity",
    "ab_test_purchase_lift",
    "ab_cuped_adjustment",
    "ab_did_estimate",
    "corpus_dup_segment_audit",
    "doc_segment_dedup_rewrite",
    "near_dup_keep_best",
    "lsh_recall_vs_exact",
    "order_price_bootstrap_ci",
    "user_value_holt_forecast",
    "stream_sliding_event_counts",
]


def _window_order(d: dict) -> dict:
    head = {n: d[n] for n in _WINDOW_PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _window_order(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _window_order(dict(ORACLE))
