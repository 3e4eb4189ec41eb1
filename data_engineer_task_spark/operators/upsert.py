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


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    *,
    effective_col: str = "eff",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge: apply an update batch to
    a versioned dimension, closing out changed rows and opening new
    versions.

    ``dim`` carries ``key_cols + tracked_cols + from_col + to_col +
    current_col``; ``updates`` carries ``key_cols + tracked_cols +
    effective_col``. Semantics per update row:
      - tracked attributes differ from the key's current row → the
        current row closes (``to_col`` = effective, current = false)
        and a new current version opens at the effective date;
      - attributes identical → no-op (no spurious versions);
      - key absent from the dimension → insert as a new current row.
    Closed history rows pass through untouched.

    One shuffle: the full-outer key join between the current slice and
    the update batch; the three output branches are projections of that
    single join, unioned (SCD2 is the warehouse-dimension pattern the
    reference's static star schema — SURVEY §1.1 — would need the
    moment a second CSV drop changed an attribute). Assumes one update
    row per key per batch (compact the batch with ``keep_latest``
    first otherwise).
    """
    cur = dim.where(F.col(current_col))
    hist = dim.where(~F.col(current_col))
    u = updates.select(
        *key_cols,
        *[F.col(c).alias(f"_u_{c}") for c in tracked_cols],
        F.col(effective_col).alias("_u_eff"),
    )
    j = cur.join(u, key_cols, "full_outer")
    has_update = F.col("_u_eff").isNotNull()
    has_current = F.col(current_col).isNotNull()
    same = F.lit(True)
    for c in tracked_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"_u_{c}"))
    changed = has_update & has_current & ~same
    out_cols = [*key_cols, *tracked_cols, from_col, to_col, current_col]

    untouched = j.where(has_current & ~changed).select(*out_cols)
    closed = j.where(changed).select(
        *key_cols,
        *tracked_cols,
        F.col(from_col),
        F.col("_u_eff").cast(dim.schema[to_col].dataType).alias(to_col),
        F.lit(False).alias(current_col),
    )
    opened = j.where(changed | (has_update & ~has_current)).select(
        *key_cols,
        *[F.col(f"_u_{c}").alias(c) for c in tracked_cols],
        F.col("_u_eff").cast(dim.schema[from_col].dataType).alias(from_col),
        F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
        F.lit(True).alias(current_col),
    )
    return (
        hist.select(*out_cols)
        .unionByName(untouched)
        .unionByName(closed)
        .unionByName(opened)
    )


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
