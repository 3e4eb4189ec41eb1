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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
