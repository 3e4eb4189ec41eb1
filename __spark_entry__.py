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
# per round. The window head is derived MECHANICALLY (VERDICT r4 item
# 6 — the hand-maintained r4 staging list said 22 when the truth was
# 32 and dropped doc_shard_assignment): every entry absent from ALL
# committed CORRECTNESS_r*.json files leads, in registration order —
# any entry new this round is automatically among them — followed by
# the explicit re-check nominations below, then the rest in
# registration order (harmless re-verification fills spare slots).
# Re-check nominations: every entry whose SPARK PLAN was rewritten or
# whose kernel changed this round — the old plan's driver-green row
# says nothing about the new plan. Round 10: `cms_merge` grew the
# disjoint-domain loud-failure guard (ADVICE r9 — an extra tiny agg +
# raise_error branch in the merge subplan), which rewrites
# `doc_token_cms_sharded_merge`'s executed plan. The r9 nominations
# went driver-green in CORRECTNESS_r09 on their current plans and left
# this list. The new r10 gate (`doc_token_cms_mixed_depth_merge`) is
# never-checked and leads the window automatically via the mechanical
# head. (`doc_token_cms_topk` is NOT nominated: it calls
# cms_estimate with an explicit depth, whose code path is unchanged.)
# `multimodal_header_decode` is also nominated: the r10 seam fix
# decorrelated the synthesizer's parameters from the format selector
# (q = id >> 2 derivations on BOTH engine sides), rewriting its plan
# and its oracle.
# `orders_incremental_join_merge` is nominated out of caution: its
# accumulator-width bound now derives from parquet footer stats
# (cached, scan-free — ADVICE r9) instead of a Spark stats job; the
# selected width is value-identical, so this is re-verification, not a
# plan rewrite.
# `stream_user_sessions` / `stream_purchase_click_outer` are
# nominated because their replay source changed (r10 sf1 sweep
# finding: minutes-delay watermarks + arbitrarily ordered multi-file
# layouts silently drop late files; both now stream through the
# event-time-ordered `_ordered_replay` rewrite).
_RECHECK = [
    "doc_token_cms_sharded_merge",
    "multimodal_header_decode",
    "orders_incremental_join_merge",
    "stream_user_sessions",
    "stream_purchase_click_outer",
]


def driver_checked() -> set[str]:
    """Entry names with at least one GREEN row across the committed
    driver correctness reports — the set the window head need not
    spend slots on. Verdict-aware (code-review r5): a red row
    (hash/rows/schema mismatch or an error) does NOT count as
    checked, so a driver-red entry automatically re-enters the next
    window head without anyone hand-editing a list."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        with open(p) as f:
            for name, row in json.load(f).items():
                ok = (
                    row.get("err") is None
                    and row.get("hash_match", row.get("rows_match", False))
                    and row.get("schema_match", True)
                    and row.get("rows_match", True)
                )
                if ok:
                    seen.add(name)
    return seen


def _window_order(d: dict) -> dict:
    checked = driver_checked()
    never = [n for n in d if n not in checked]
    head_names = never + [n for n in _RECHECK if n in d and n not in never]
    head = {n: d[n] for n in head_names}
    return head | {n: v for n, v in d.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _window_order(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    return _window_order(dict(ORACLE))
