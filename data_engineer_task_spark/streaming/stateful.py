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


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Same running-totals state machine on the NEXT-generation
    stateful API (``transformWithStateInPandas``, Spark 4.x): typed
    named state slots on a processor handle instead of one opaque
    tuple, per-key timers, and composite state (value/list/map) —
    the API Spark is converging custom streaming state on. Requires
    the RocksDB state-store provider (changelog-checkpointable,
    memory-bounded — the store that holds 100 TB-scale state) and the
    protobuf package (the TWS state-server wire format; environments
    without it keep the ``running_user_totals`` path above)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            prev = self._totals.get() if self._totals.exists() else (0, 0.0)
            n, v = prev
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].fillna(0.0).sum())
            self._totals.update((n, v))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(v, 2)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
