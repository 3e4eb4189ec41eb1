"""Scale-safe global ordering primitives: rank / prefix sums over a
total order WITHOUT a single-partition window.

Every distributed SQL engine hits the same wall: ``row_number() OVER
(ORDER BY ...)`` with no PARTITION BY moves the whole frame through
one task. The standard fix — and what this module packages — is the
two-level spelling:

1. split the frame into RANGE buckets on the order key (cut points
   from one ``approx_percentile`` pass — the cuts only control
   physical placement, never the answer, so sketch approximation is
   harmless);
2. aggregate per-bucket counts / sums (one tiny frame, ≤ `buckets`
   rows) and turn them into exclusive running offsets ON THE DRIVER —
   bounded metadata, the same class as collected k-means centroids;
3. rank / prefix-sum WITHIN each bucket via a PARTITIONED window and
   add the bucket's offset — map-only after one balanced shuffle.

DETERMINISM CONTRACT (CLAUDE.md float rule): ranks are exact integers
by construction; prefix sums are only offered over INTEGRAL columns
(cents-quantized longs etc.), so bucket-boundary placement can never
re-associate a float sum — the result is bit-identical for ANY cut
vector, which is what makes the approximate cut sampling safe.

No ``spark_partition_id()`` anywhere: buckets are a pure function of
the row's own key, so retries, AQE coalescing, and re-planning cannot
move a row between buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _bucket_expr(key: Column, cuts: Sequence[float | int]) -> Column:
    """0-based range-bucket id: the number of cut points strictly
    below ``key`` — a fixed chain of ≤ `buckets` comparisons, fully
    codegen'd, no join."""
    b: Column = F.lit(0)
    for c in cuts:
        b = b + (key > F.lit(c)).cast("int")
    return b


def ordered_prefix(
    df: DataFrame,
    key: str | Column,
    tiebreak: Sequence[str | Column] = (),
    *,
    rank_col: str | None = "rank",
    sums: dict[str, str] | None = None,
    buckets: int = 64,
    materialize: bool = False,
) -> DataFrame:
    """Add a 1-based global ``rank_col`` (dense total-order position)
    and/or EXCLUSIVE prefix sums over integral columns, ordered by
    ``(key ASC, *tiebreak ASC)``.

    ``sums`` maps output column → existing INTEGRAL column; each
    output holds the sum of that column over all rows STRICTLY before
    this one in the total order. Descending orders: negate the key
    (and flip tie-breaks) at the call site — integer negation is
    exact.

    Cost: one ``approx_percentile`` pass for the cuts, one per-bucket
    aggregate (collected: ≤ ``buckets`` rows of driver metadata), one
    balanced shuffle for the partitioned rank window.

    INPUT CONTRACT (code-review r5): the three passes re-execute
    ``df``'s lineage, so the input must be DETERMINISTIC across jobs —
    no unordered ``.limit()``, ``monotonically_increasing_id``, or
    mutating source underneath. A nondeterministic input can make the
    collected bucket offsets disagree with the rows ranked in the
    final job (duplicate/gapped ranks, or an out-of-range bucket id).
    ``materialize=True`` snapshots the input first when you can't
    guarantee that.
    """
    kcol = F.col(key) if isinstance(key, str) else key
    tb = [F.col(t) if isinstance(t, str) else t for t in tiebreak]
    sums = sums or {}

    # The cut pass, the per-bucket stats pass, and the final plan are
    # three driver jobs that each re-execute the caller's upstream
    # lineage. Deliberately NOT checkpointed: measured at sf0.1,
    # eager localCheckpoint cost MORE than the recomputation it saved
    # (materialization blocks + an ExistingRDD scan that forfeits
    # column pruning / codegen downstream) — see BASELINE.md's r5
    # builder note. On a real cluster, persist() the input before
    # calling when its lineage is expensive; pass materialize=True to
    # opt into the local checkpoint instead.
    if materialize:
        df = df.localCheckpoint(eager=True)

    with_key = df.withColumn("_opk", kcol.cast("double"))
    probs = [i / buckets for i in range(1, buckets)]
    # accuracy 1000 (not the 10000 default): the cuts only control
    # PLACEMENT — every rank/sum is exact-integer and cut-invariant —
    # so cheap sketching is free; 1000 still bounds bucket imbalance
    # to ~0.1% of rows per cut at any scale.
    cuts_row = with_key.agg(
        F.expr(
            f"approx_percentile(_opk, array({', '.join(str(p) for p in probs)}), 1000)"
        ).alias("c")
    ).collect()[0]["c"]
    cuts = sorted(set(cuts_row or []))

    b = df.withColumn("_b", _bucket_expr(kcol.cast("double"), cuts))
    stat_aggs = [F.count(F.lit(1)).cast("long").alias("_cnt")] + [
        F.sum(src).cast("long").alias(f"_s_{out}") for out, src in sums.items()
    ]
    stats = {r["_b"]: r for r in b.groupBy("_b").agg(*stat_aggs).collect()}
    if None in stats:
        # a NULL key yields a NULL bucket (`key > cut` is NULL); the
        # replaced single-window spelling would have ranked such rows
        # NULLS FIRST, but none of the house callers produce them —
        # fail loudly rather than TypeError in the offset sort below
        raise ValueError(
            "ordered_prefix requires a non-null key; filter or "
            "coalesce NULL keys (and decide their rank order) first"
        )

    # exclusive running offsets per bucket, computed on ≤`buckets`
    # rows of driver metadata
    offsets: dict[int, dict[str, int]] = {}
    run_cnt = 0
    run_sums = {out: 0 for out in sums}
    for bid in sorted(stats):
        offsets[bid] = {"_cnt": run_cnt, **dict(run_sums)}
        run_cnt += stats[bid]["_cnt"]
        for out in sums:
            run_sums[out] += stats[bid][f"_s_{out}"] or 0

    max_b = max(offsets, default=0)
    cnt_arr = F.array(
        *[F.lit(offsets.get(i, {"_cnt": 0})["_cnt"]) for i in range(max_b + 1)]
    )
    w = W.partitionBy("_b").orderBy(kcol.asc(), *[t.asc() for t in tb])
    out_df = b
    if rank_col is not None:
        out_df = out_df.withColumn(
            rank_col,
            (
                F.element_at(cnt_arr, F.col("_b") + 1)
                + F.row_number().over(w)
            ).cast("long"),
        )
    for out, src in sums.items():
        sum_arr = F.array(
            *[F.lit(offsets.get(i, {}).get(out, 0)) for i in range(max_b + 1)]
        )
        local = F.coalesce(
            F.sum(src).over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )
        out_df = out_df.withColumn(
            out,
            (F.element_at(sum_arr, F.col("_b") + 1) + local).cast("long"),
        )
    return out_df.drop("_b")


def ntile_of_rank(rank: Column, n_total: Column, n_tiles: int) -> Column:
    """The bucket ``ntile(n_tiles)`` assigns to 1-based ``rank`` in a
    ``n_total``-row total order — pure integer `div` arithmetic: the
    first ``n_total % n_tiles`` tiles hold ``n_total div n_tiles + 1``
    rows, the rest one fewer. The q=0 ELSE branch is unreachable
    (rank > m·(q+1) = n_total is impossible when q=0), so the lazy
    CASE never divides by zero under ANSI. Pair with
    ``ordered_prefix``'s rank to spell a global ntile without the
    single-partition window.

    Exactness: the `(x - x % d) / d` integer divisions go through
    DOUBLE, which is exact for operands < 2^53 (numerator is an exact
    multiple of d and the integer quotient is representable, so the
    correctly-rounded division IS the quotient) — ~9e15 rows, far
    past any declared workload; membership can't flip below that."""
    qq = ((n_total - (n_total % n_tiles)) / n_tiles).cast("long")
    m = (n_total % n_tiles).cast("long")
    size_big = qq + 1
    cut = m * size_big
    return F.when(
        rank <= cut, ((rank + qq) - ((rank + qq) % size_big)) / size_big
    ).otherwise(
        m + ((rank - cut + qq - 1) - ((rank - cut + qq - 1) % qq)) / qq
    ).cast("long")
