"""Streaming → warehouse merge sink (foreachBatch upsert).

Structured Streaming's file sink is append-only; real pipelines need
UPSERT (keep the latest version per key) into a queryable table. With
a transactional format that's ``MERGE INTO``; on plain parquet the
equivalent is this foreachBatch pattern: each micro-batch merges into
the previous snapshot with ``keep_latest`` and commits a NEW versioned
snapshot directory, then atomically swaps a pointer file. Readers
always see a complete snapshot (never a half-written directory), and a
retried epoch rewrites its own snapshot dir — idempotent, because the
merge input (previous pointer + replayed batch) is unchanged. This is
the snapshot-isolation core of a table format, small enough to audit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.upsert import keep_latest

_POINTER = "_LATEST"


def read_snapshot(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Current committed snapshot, or None before the first commit."""
    ptr = os.path.join(out_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        version = fh.read().strip()
    return spark.read.parquet(os.path.join(out_dir, version))


def _commit(out_dir: str, version: str) -> None:
    """Atomically repoint the snapshot pointer (write-temp + rename —
    POSIX rename is atomic on one filesystem)."""
    ptr = os.path.join(out_dir, _POINTER)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(version)
    os.replace(tmp, ptr)


def stream_merge_to_warehouse(
    stream_df: DataFrame,
    out_dir: str,
    key_cols: list[str],
    version_cols: list[str],
    *,
    checkpoint_dir: str | None = None,
):
    """Start the merge sink on a streaming DataFrame; returns the
    StreamingQuery (caller drives/stops it). Each epoch:
    previous snapshot ∪ batch → keep_latest → snapshot v{epoch} →
    pointer swap."""
    os.makedirs(out_dir, exist_ok=True)
    spark = stream_df.sparkSession

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        prev = read_snapshot(spark, out_dir)
        base = prev.unionByName(batch_df) if prev is not None else batch_df
        merged = keep_latest(base, key_cols, version_cols)
        version = f"v{epoch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(out_dir, version))
        _commit(out_dir, version)

    writer = stream_df.writeStream.outputMode("update").foreachBatch(merge_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
