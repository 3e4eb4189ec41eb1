"""Change-capture compaction: keep the latest version per key.

The standard warehouse upsert/merge shape — a base snapshot unioned
with update batches, compacted to one surviving row per business key.
One shuffle on the key, a window `row_number`, done; at scale the
partition count on the key column is the only tuning knob, and AQE's
skew-join splitting handles hot keys. (A transactional table format
would push this into MERGE INTO; the operator is the engine-side
equivalent when the sink is plain parquet.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str | Column],
) -> DataFrame:
    """One row per key: the max by ``version_cols`` (descending, in
    order — e.g. [ts, event_id] = newest timestamp, highest id breaking
    ties). Deterministic as long as the version tuple is unique per
    key."""
    order = [
        F.desc(c) if isinstance(c, str) else c.desc() for c in version_cols
    ]
    w = W.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
