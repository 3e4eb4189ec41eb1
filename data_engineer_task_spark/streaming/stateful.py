"""Custom stateful streaming: per-key running aggregates via
``applyInPandasWithState`` (Arrow-batched, user-managed state).

The built-in windowed aggregations (aggregate.py) cover time-bucketed
state; this operator is the escape hatch for state machines Spark's
aggregates can't express (running totals, per-entity counters, custom
session logic). State is a (count, value_sum) pair per user, updated
per micro-batch; each batch emits the keys it touched with their
running totals.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, v double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].fillna(0.0).sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(v, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame in → per-batch updated running totals out.
    Works on a streaming df (real state across micro-batches)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
