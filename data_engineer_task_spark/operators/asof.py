"""As-of (backward temporal) join — an operator Spark lacks natively.

For each left row, attach the most recent right row of the same key
with ``right_ts <= left_ts`` (inclusive). Implemented as the
union-marker pattern: tag sides, union on (key, ts, side), and carry
the right payload forward with ``last(..., ignorenulls=True)`` over a
(key, ts, side) window — ONE shuffle on the key, no per-group pandas,
no range-bucketed self-join. At equal timestamps the right row sorts
first (side 0 < 1), so "at or before" is inclusive, matching SQL
``ASOF LEFT JOIN ... ON l.ts >= r.ts``.

Scale: equivalent to a single sort-based shuffle on the join key —
the same cost class as a sort-merge join, with skew handled by AQE.
The alternative (``pd.merge_asof`` inside ``applyInPandas``) pays
Arrow transfer plus Python per group; this stays in codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: Sequence[str] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join. Output: every left row + ``{right_ts}{suffix}``
    (+ each right value col suffixed), NULL where no prior right row.

    The right payload travels as ONE struct filled with a single
    ``last(ignorenulls)``: filling each carried column independently
    would stitch values from DIFFERENT right rows whenever the matched
    row holds a NULL value (an older row's value would leak under the
    newer row's timestamp — a tuple no right row ever contained).
    Right rows with a NULL key or timestamp are filtered (SQL ASOF
    semantics: they can match nothing; a NULL ts would also sort
    NULLS-FIRST and phantom-fill every left row)."""
    on = [on] if isinstance(on, str) else list(on)
    carried = [right_ts, *right_value_cols]

    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    left_types = dict(left.dtypes)
    rsch = {f.name: f for f in right.schema.fields}
    pay_type = T.StructType(
        [T.StructField(c, rsch[c].dataType, True) for c in carried]
    )

    r_ok = F.lit(True)
    for c in [*on, right_ts]:
        r_ok = r_ok & F.col(c).isNotNull()

    l_side = left.select(
        *on,
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(pay_type).alias("_rpay"),
    )
    r_side = right.where(r_ok).select(
        *on,
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_payload],
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("_rpay"),
    )

    w = (
        W.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l_side.unionByName(r_side).withColumn(
        "_rpay", F.last("_rpay", ignorenulls=True).over(w)
    )
    return filled.where(F.col("_side") == 1).select(
        *on,
        F.col("_ts").alias(left_ts),
        *left_payload,
        *[F.col(f"_rpay.{c}").alias(f"{c}{suffix}") for c in carried],
    )


def as_of_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: Sequence[str] = (),
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: str | None = None,
    buckets: int = 64,
) -> DataFrame:
    """As-of join on the cogrouped-Arrow path: the ``as_of_join``
    contract plus ``direction`` ('backward' | 'forward' | 'nearest')
    and ``tolerance`` (a pandas offset string, e.g. '1 hour') —
    semantics the union-marker window form can't express (nearest
    needs both temporal directions at once; tolerance bounds the match
    window). Nulls follow SQL ASOF semantics, same as the window form:
    null keys/timestamps never match (left rows kept unmatched, right
    rows dropped).

    Shape at scale: the cogroup key is a COARSE hash bucket of the join
    key (``buckets`` of them), not the key itself — ``pd.merge_asof``'s
    ``by=`` does the per-key alignment inside each bucket. Cogrouping
    per key would pay one Python call + Arrow round-trip per key, which
    at millions of keys dominates the join (measured 10× slower on the
    events table); per bucket, that overhead amortizes while each key's
    rows still co-locate. Use the window-based ``as_of_join`` for plain
    backward joins (stays in codegen); reach for this one when
    direction/tolerance matter or per-group logic grows beyond SQL.
    Requires both ts columns to be real timestamps (see
    ``sources/catalog.py`` normalization).
    """
    import pandas as pd

    on = [on] if isinstance(on, str) else list(on)
    carried = [right_ts, *right_value_cols]
    left_payload = [c for c in left.columns if c not in on and c != left_ts]

    lsch = {f.name: f for f in left.schema.fields}
    rsch = {f.name: f for f in right.schema.fields}
    out_schema = T.StructType(
        [lsch[c] for c in [*on, left_ts, *left_payload]]
        + [
            T.StructField(f"{c}{suffix}", rsch[c].dataType, True)
            for c in carried
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    # SQL ASOF semantics for nulls: a null key or null timestamp never
    # matches. Null-bearing left rows bypass the merge (kept, unmatched)
    # — pd.merge_asof refuses null merge keys outright; null-bearing
    # right rows can match nothing and are dropped.
    nullable = [*on, left_ts]
    null_cond = F.lit(False)
    for c in nullable:
        null_cond = null_cond | F.col(c).isNull()
    left_null = left.where(null_cond).select(
        *on,
        F.col(left_ts),
        *[c for c in left.columns if c not in on and c != left_ts],
        *[
            F.lit(None).cast(rsch[c].dataType).alias(f"{c}{suffix}")
            for c in carried
        ],
    )

    bkt = F.pmod(F.hash(*on), F.lit(buckets))
    left_b = left.where(~null_cond).withColumn("_bkt", bkt)
    # Alias-to-self on the right's key columns: left and right commonly
    # derive from the same scan (purchases/clicks slices of one events
    # table), so the raw key attributes carry the SAME expression id on
    # both sides — and the cogroup planner dedups right-side attributes
    # it thinks the left already provides, silently dropping the key
    # from the right frame. An alias mints a fresh expression id.
    r_null = F.lit(False)
    for c in [*on, right_ts]:
        r_null = r_null | F.col(c).isNull()
    right_b = (
        right.where(~r_null)
        .select(
            *[F.col(c).alias(c) for c in on],
            *[F.col(c).alias(f"{c}{suffix}") for c in carried],
        )
        .withColumn("_bkt", bkt)
    )
    tol = pd.Timedelta(tolerance) if tolerance is not None else None

    def align(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=out_cols)
        merged = pd.merge_asof(
            lpdf.drop(columns=["_bkt"]).sort_values(left_ts),
            rpdf.drop(columns=["_bkt"]).sort_values(f"{right_ts}{suffix}"),
            left_on=left_ts,
            right_on=f"{right_ts}{suffix}",
            by=on,
            direction=direction,
            tolerance=tol,
        )
        return merged[out_cols]

    matched = (
        left_b.groupBy("_bkt")
        .cogroup(right_b.groupBy("_bkt"))
        .applyInPandas(align, schema=out_schema)
    )
    return matched.unionByName(left_null)
