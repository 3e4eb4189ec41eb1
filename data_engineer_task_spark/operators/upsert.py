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

    ONE key join, one pass: the current slice full-outer-joins the
    update batch, then each joined row explodes an array of its
    applicable output structs (survivor / closed version / opened
    version). A union-of-three-projections formulation instead gets
    rewritten by Catalyst into three separate joins with the
    branch-specific null filters pushed below each — re-scanning and
    re-shuffling both inputs per branch (observed: 6 scans at
    testdata scale). The explode form keeps a single join whose
    shuffle both sides pay once; the fan-out is a JVM-side Expand-like
    generate, never more than 2 rows per input row. (SCD2 is the
    warehouse-dimension pattern the reference's static star schema —
    SURVEY §1.1 — would need the moment a second CSV drop changed an
    attribute.) Assumes one update row per key per batch (compact the
    batch with ``keep_latest`` first otherwise).
    """
    # NULL is_current routes to history (kept, never silently dropped);
    # it can only arise from upstream corruption, and losing the row is
    # strictly worse than carrying it as non-current.
    is_cur_flag = F.coalesce(F.col(current_col), F.lit(False))
    cur = dim.where(is_cur_flag)
    hist = dim.where(~is_cur_flag)
    eff_t = updates.schema[effective_col].dataType
    u = updates.select(
        *key_cols,
        *[F.col(c).alias(f"_u_{c}") for c in tracked_cols],
        # a NULL effective date cannot version anything — fail loudly
        # per-row instead of silently dropping the update (lazy check,
        # costs one null test per update row)
        F.when(
            F.col(effective_col).isNull(),
            F.raise_error(
                F.lit(f"scd2_merge: NULL {effective_col} in updates")
            ).cast(eff_t),
        )
        .otherwise(F.col(effective_col))
        .alias("_u_eff"),
        F.lit(True).alias("_u_present"),
    )
    j = cur.join(u, key_cols, "full_outer")
    # presence markers survive the outer join as non-null literals —
    # unlike data columns, which may be legitimately null
    has_update = F.col("_u_present").isNotNull()
    # every cur-slice row carries a literal TRUE current flag (the
    # coalesce filter above), so non-null ⇔ the key had a current row
    has_current = F.col(current_col).isNotNull()
    same = F.lit(True)
    for c in tracked_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"_u_{c}"))
    changed = has_update & has_current & ~same
    out_cols = [*key_cols, *tracked_cols, from_col, to_col, current_col]
    from_t = dim.schema[from_col].dataType
    to_t = dim.schema[to_col].dataType

    def branch(cond, tracked_vals, vfrom, vto, is_cur):
        return F.when(
            cond,
            F.struct(
                *[v.alias(c) for c, v in zip(tracked_cols, tracked_vals)],
                vfrom.alias(from_col),
                vto.alias(to_col),
                is_cur.alias(current_col),
            ),
        )

    olds = [F.col(c) for c in tracked_cols]
    news = [F.col(f"_u_{c}") for c in tracked_cols]
    branches = F.array(
        # existing current row survives untouched (no update / no-op)
        branch(
            has_current & ~changed,
            olds, F.col(from_col), F.col(to_col), F.col(current_col),
        ),
        # changed: close the old version at the effective date
        branch(
            changed,
            olds, F.col(from_col), F.col("_u_eff").cast(to_t), F.lit(False),
        ),
        # changed or brand-new key: open a new current version
        branch(
            changed | (has_update & ~has_current),
            news,
            F.col("_u_eff").cast(from_t),
            F.lit(None).cast(to_t),
            F.lit(True),
        ),
    )
    merged = j.select(
        *key_cols,
        F.explode(F.filter(branches, lambda b: b.isNotNull())).alias("_b"),
    ).select(*key_cols, "_b.*")
    return hist.select(*out_cols).unionByName(merged)


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
