"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic events generator, batch + streaming.

This is the engine's "bring your own source" surface — the same API a
production deployment would use to wrap an internal feed the built-in
connectors don't speak. The generator itself doubles as a load/test
fixture: rows are a pure function of (partition, row index, seed), so
any two reads — batch or resumed stream — produce identical data,
which makes it usable in correctness tests and deterministic scale
experiments (no files on disk, rows materialize inside each executor
partition).

Batch:
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.read.format("synthetic_events")
         .option("rows_per_partition", 1000)
         .option("num_partitions", 8).load()

Streaming (micro-batches of ``rows_per_batch`` rows):
    spark.readStream.format("synthetic_events")
         .option("rows_per_batch", 500).load()
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

_TYPES = ("view", "click", "purchase", "signup", "error")
_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _row(global_idx: int, seed: int):
    """Pure deterministic row function: md5(seed, idx) drives every
    field, so data is identical across retries, executors, engines."""
    h = hashlib.md5(f"{seed}:{global_idx}".encode()).digest()
    u = int.from_bytes(h[:8], "big")
    return (
        global_idx,
        _T0 + timedelta(seconds=global_idx * 7 + u % 5),
        u % 1000,
        _TYPES[u % len(_TYPES)],
        round((u % 100000) / 100.0, 2),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_parts = int(options.get("num_partitions", 4))
        self.rows_per = int(options.get("rows_per_partition", 1000))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        return [
            _RangePartition(p * self.rows_per, (p + 1) * self.rows_per, self.seed)
            for p in range(self.n_parts)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i, partition.seed)


class _StreamReader(DataSourceStreamReader):
    """Offset = next global row index; each micro-batch emits the next
    ``rows_per_batch`` rows. Offsets are plain dicts, checkpointed by
    Structured Streaming, so a restarted query resumes exactly where
    the previous run committed — determinism makes the resumed rows
    bit-identical."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 500))
        self.n_parts = int(options.get("num_partitions", 2))
        self.seed = int(options.get("seed", 0))
        self._next = 0   # offset generator (what latestOffset hands out)
        self._floor = 0  # proven progress (rows below are already emitted)

    def initialOffset(self):
        return {"idx": 0}

    def latestOffset(self):
        self._next = max(self._next, self._floor) + self.rows_per_batch
        return {"idx": self._next}

    def partitions(self, start, end):
        # Restart safety: a fresh reader starts at 0, but the
        # checkpoint may restore an offset far ahead — latestOffset()
        # would then regress BEHIND the committed offset, and a later
        # batch spanning the stale range would re-emit committed rows,
        # breaking the exactly-once resume this class promises. The
        # floor records how far the stream is PROVEN to have progressed
        # (any planned range is such proof); rows below it are never
        # emitted again. Kept separate from the _next generator: the
        # pending latestOffset value is NOT progress yet.
        lo, hi = start["idx"], end["idx"]
        floor = max(self._floor, lo)
        self._floor = max(floor, hi)
        if hi <= floor:
            return []
        step = max(1, (hi - floor) // self.n_parts)
        bounds = list(range(floor, hi, step)) + [hi]
        return [
            _RangePartition(a, b, self.seed)
            for a, b in zip(bounds, bounds[1:])
            if a < b
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i, partition.seed)

    def commit(self, end):
        self._floor = max(self._floor, end["idx"])


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SYNTH_SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)
