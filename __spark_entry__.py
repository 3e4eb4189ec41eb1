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
# per round. Rounds 1+2 drove 100 disjoint entries green; round 3
# rotates 48 never-driver-checked entries into the window —
# prioritizing the divergence-prone float-heavy stats family, the
# time-series family, attribution/graph, and the newest ext23 batch —
# plus the two capstones (kmeans / IVF top-k) so the driver re-checks
# them now that they carry unrolled fixed-iteration DuckDB oracles.
# Registration order in plans/ is unchanged — only this contract
# surface reorders.
_WINDOW_PRIORITY = [
    # capstones, re-nominated with oracles (VERDICT r2 next-4)
    "embedding_kmeans_clusters",
    "embedding_ivf_topk",
    # float-heavy stats (VERDICT r2 next-1)
    "nation_theil_decomposition",
    "order_acctbal_spearman",
    "event_value_psi",
    "ab_ratio_metric_delta",
    "ab_srm_check",
    "lang_source_chisq",
    "status_priority_entropy",
    "lang_source_mutual_info",
    "priority_price_dispersion",
    "priority_geomean_price",
    "customer_revenue_gini",
    "nation_revenue_hhi",
    "nation_revenue_share",
    "order_price_benford",
    "order_price_winsorized",
    "order_price_histogram",
    "event_reach_wilson_ci",
    "event_value_ks_test",
    "event_value_cusum_changepoint",
    "user_survival_km",
    "doc_labeler_agreement_kappa",
    "lang_target_encoding_loo",
    "order_price_woe_bins",
    "event_dow_seasonal_anomalies",
    "nation_revenue_trend_ols",
    # time series
    "event_rolling_median",
    "event_hourly_interpolation",
    "user_value_ewma",
    "user_value_twap",
    "user_value_lag_features",
    "event_daily_acf",
    "event_seasonal_naive_backtest",
    "event_hourly_ohlc",
    "event_interarrival_stats",
    "event_time_rollup",
    "peak_concurrent_users_daily",
    "rolling_distinct_users",
    "user_activity_islands",
    "daily_new_returning_users",
    # ext23 batch (VERDICT r2 next-1/next-5)
    "near_dup_containment_pairs",
    "doc_padding_waste_by_bucketing",
    "embedding_dimension_profile",
    "lang_id_confusion",
    "quality_dup_interaction",
    # attribution / graph / cohort
    "purchase_attribution_last_touch",
    "purchase_attribution_position",
    "brand_copurchase_pagerank",
    "user_cohort_ltv_curve",
]


def _window_order(d: dict) -> dict:
    head = {n: d[n] for n in _WINDOW_PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _window_order(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _window_order(dict(ORACLE))
