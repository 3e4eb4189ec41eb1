"""Bounded time-range join — equi-key + `right_ts ∈ [left_ts+lower,
left_ts+upper]` — without a theta join.

A naive implementation is `l JOIN r ON key AND r.ts BETWEEN ...`:
Spark executes the range predicate as a post-join filter inside a
single per-key join group, which degenerates when keys are hot. The
scale-safe shape is time bucketing: assign each right row to a bucket
of width `upper - lower`, have each left row probe only the (at most
two) buckets its window can overlap, join on (key, bucket) — a plain
equi-shuffle — then apply the exact range filter. Join fan-in per task
is bounded by bucket population, not key population, and AQE can
split residual hot buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int,
    upper_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join left×right on equal keys where
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s`` (seconds).
    Right timestamp column is renamed ``{right_ts}_r`` in the output.
    ``how`` ∈ {'inner', 'left'} ('left' keeps unmatched left rows with
    NULL right columns, implemented as inner + add-back anti side)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    width = upper_s - lower_s
    if width <= 0:
        raise ValueError("upper_s must be > lower_s")

    r_cols = [c for c in right.columns if c not in on and c != right_ts]
    r = right.select(
        *on,
        F.col(right_ts).cast("timestamp").alias(f"{right_ts}_r"),
        *r_cols,
    ).withColumn(
        "_bucket", F.floor(F.col(f"{right_ts}_r").cast("long") / width)
    )

    lo = (F.col(left_ts).cast("long") + lower_s) / width
    hi = (F.col(left_ts).cast("long") + upper_s) / width
    l = left.withColumn(
        "_bucket", F.explode(F.sequence(F.floor(lo), F.floor(hi)))
    )

    # Exact containment at microsecond precision (timestamps truncate to
    # micros on load; second-granularity cast would widen the window).
    joined = l.join(r, [*on, "_bucket"]).where(
        F.unix_micros(F.col(f"{right_ts}_r")).between(
            F.unix_micros(F.col(left_ts)) + lower_s * 1_000_000,
            F.unix_micros(F.col(left_ts)) + upper_s * 1_000_000,
        )
    )
    inner = joined.drop("_bucket")
    if how == "inner":
        return inner
    matched_keys = inner.select(*on, left_ts).distinct()
    unmatched = left.join(matched_keys, [*on, left_ts], "left_anti")
    null_right = [
        F.lit(None).cast(t).alias(c)
        for c, t in inner.dtypes
        if c not in left.columns
    ]
    return inner.unionByName(unmatched.select("*", *null_right))
