"""Count-min sketch — mergeable frequency estimation for token streams.

At corpus scale the exact token-frequency table is itself big (every
distinct token shuffles), but most consumers only need *estimates* for
a bounded probe set (heavy-hitter monitoring, stopword discovery,
vocabulary pruning). A count-min sketch compresses the whole frequency
distribution into a fixed ``depth × width`` counter grid:

  counter[j][h_j(token)] += count(token)        (build)
  est(token) = min_j counter[j][h_j(token)]     (probe; est >= truth)

The grid is tiny (KBs), mergeable by cell-wise addition — per-partition
or per-day sketches sum into a global one, the same partial-merge
contract as Spark's HLL sketches — and the one-sided error bound is
the textbook guarantee: overestimate only, by at most ``e/width``
of the total count with probability ``1 - e^-depth``.

Hashing is the engine-portable md5-byte trick shared with
``operators/sampling.py``: ``h_j(token) = byte0(md5('cms:' || j || ':' || token))``
so a SQL oracle (DuckDB) reproduces the exact same grid and estimates.

Reference scope note: the reference (``coded4alex/data_engineer_task``)
has no approximate operators at all (SURVEY §2.5) — this extends the
engine for the 100 TB curation workload alongside HLL and
``percentile_approx``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _md5_byte0


def _bucket(j: Column | int, token: Column) -> Column:
    jcol = F.lit(j) if isinstance(j, int) else j
    # shared engine-portable md5-byte helper (one copy to keep the
    # Spark and SQL-oracle spellings in lockstep). 'cms:' salt per the
    # house per-operator-salt rule (code-review r5): unsalted
    # 'j:value' was byte-identical to dedup.py's minhash seeding
    # md5('i:' || shingle), so a CMS built over minhash-selected
    # shingles would concentrate those keys in the low buckets of the
    # matching row and break the depth rows' independence.
    return _md5_byte0(
        F.concat(jcol.cast("string"), F.lit(":"), token.cast("string")),
        salt="cms:",
    )


def cms_build(
    tokens: DataFrame,
    token_col: str,
    *,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: ``(j, bucket, c)`` with ``depth × 256`` cells.

    Two-stage aggregation keeps the expensive shuffle cheap: the first
    groupBy collapses duplicate tokens with map-side partial combine
    (the only shuffle that scales with the corpus, and it carries one
    row per distinct token); the depth-way fan-out then happens on the
    collapsed vocabulary, and the second shuffle is bounded by
    ``depth × 256`` cells regardless of input size.

    ``weight_col`` lets callers feed pre-aggregated (token, count)
    frames — sketches built from partial counts merge exactly
    (cell-wise sum ≡ one-shot build; see the partial-merge test).
    """
    if weight_col is None:
        vocab = tokens.groupBy(token_col).agg(F.count(F.lit(1)).alias("_w"))
    else:
        vocab = tokens.groupBy(token_col).agg(F.sum(weight_col).alias("_w"))
    fanout = vocab.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
        F.col(token_col),
        "_w",
    )
    return (
        fanout.select("j", _bucket(F.col("j"), F.col(token_col)).alias("bucket"), "_w")
        .groupBy("j", "bucket")
        .agg(F.sum("_w").cast("long").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches by cell-wise addition (exact, order-free)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("c").cast("long").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str,
    *,
    depth: int = 4,
) -> DataFrame:
    """Estimate counts for a probe-token set: probes + ``cms_est``.

    The sketch is at most ``depth × 256`` rows → broadcast; the probe
    fan-out (probes × depth) joins it map-only, then one tiny groupBy
    takes the min across rows. Absent cells count as 0 (a token whose
    cell was never touched has true count 0).
    """
    fanout = probes.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    ).withColumn("bucket", _bucket(F.col("j"), F.col(token_col)))
    probe_cols = [c for c in probes.columns]
    return (
        fanout.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(*probe_cols)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — mergeable cardinality
# estimation. The 100 TB counterpart of COUNT(DISTINCT …): the exact
# count shuffles every distinct value; a KMV sketch keeps only the k
# smallest 48-bit hashes per group (O(k) state, mergeable by
# union-then-re-min, the theta-sketch building block), and estimates
#   n̂ = (k-1) · 2^48 / h_(k)        (|sketch| < k → exact |sketch|)
# with relative error ~1/sqrt(k-2). Hashing is the engine-portable
# salted-md5 spelling shared with operators/sampling.py, so a DuckDB
# oracle reproduces the exact same sketch, estimate, and (for the
# theta-style overlap) the exact same intersection membership —
# every decision this family makes rides exact integers; the only
# floats are single correctly-rounded IEEE divisions of exactly-
# representable doubles (h < 2^48 < 2^53; (k-1)·2^48 has ≤10
# significant bits), bitwise identical cross-engine.
# ---------------------------------------------------------------------------

_KMV_BITS = 48


def kmv_hash(col: Column, salt: str = "kmv:") -> Column:
    """First 12 md5 nibbles (0 … 2^48-1) of salt + stringified value —
    the sketch's portable uniform. 48 bits keeps h exactly
    representable as a DOUBLE for the final division while making
    full-prefix collisions negligible (~n²/2^49)."""
    from .sampling import _HEX

    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    hv = lambda p: F.instr(F.lit(_HEX), F.substring(h, p, 1)) - 1  # noqa: E731
    # LONG accumulator from the start: 12 nibbles overflow INT, and
    # ANSI mode throws on overflow instead of wrapping.
    acc: Column = hv(1).cast("long")
    for p in range(2, 13):
        acc = acc * 16 + hv(p)
    return acc


def k_smallest(
    df: DataFrame,
    k: int,
    group_cols: tuple[str, ...],
    *,
    salt_buckets: int = 64,
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """The k smallest ``h`` per group via a SALTED two-level rank —
    never a single-task global sort (ADVICE r4). Level 1 partitions by
    (group, h % salt_buckets): h is md5-uniform so the salt spreads a
    hot group evenly, and the rank-k filter cuts each salt bucket to
    ≤ k rows. Level 2 re-ranks the ≤ salt_buckets·k survivors per
    group — a bounded frame. Exact: every global k-smallest hash is
    among its own salt bucket's k smallest, so level 1 never drops a
    winner; the salt is derived from h itself, so the result is
    deterministic regardless of physical partitioning.

    ``tiebreak``: extra ascending order columns after ``h`` for
    callers whose h values can collide (KMV frames are DISTINCT
    hashes, so they pass none).

    BOUND (self-review r6): level 2 funnels ≤ salt_buckets·k rows per
    group through ONE task — sketch-sized k (64–1024, every house
    caller) keeps that ≤ 64k rows; for k ≳ 10⁵ this operator is the
    wrong tool (the "sketch" is corpus-sized) — rank with
    ``operators/ranking.py::ordered_prefix`` per group instead, or
    raise ``salt_buckets`` toward k so level 1 does the cutting."""
    from pyspark.sql import Window as W

    order = [F.asc("h"), *(F.asc(t) for t in tiebreak)]
    w1 = W.partitionBy(
        *group_cols, F.pmod(F.col("h"), F.lit(salt_buckets))
    ).orderBy(*order)
    pre = (
        df.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    if not group_cols:
        # global sketch: TakeOrderedAndProject (per-partition top-k +
        # driver merge of ≤ salt_buckets·k rows) — no window at all
        return pre.orderBy(*order).limit(k)
    w2 = W.partitionBy(*group_cols).orderBy(*order)
    return (
        pre.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


_k_smallest = k_smallest  # private alias kept for callers predating the public name


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 64,
    group_cols: tuple[str, ...] = (),
    salt: str = "kmv:",
) -> DataFrame:
    """Build the sketch: the k smallest DISTINCT hashes per group,
    ``group_cols + (h,)``.

    The one corpus-sized shuffle carries a single row per distinct
    (group, hash) — map-side partial distinct collapses duplicates
    before the exchange — and the salted two-level rank-k filter
    (``k_smallest``) drops everything else without ever funneling a
    group's full distinct-hash set through one task. At production
    scale you never rebuild from raw data: per-shard / per-day
    sketches persist and ``kmv_merge`` folds them (union → re-min,
    exactly one-shot-equivalent — property-tested)."""
    hashed = (
        df.select(*group_cols, kmv_hash(F.col(value_col), salt).alias("h"))
        # NULL values hash to NULL (concat propagates), and Spark's
        # ASC NULLS FIRST would seat the NULL at rank 1, wasting a
        # sketch slot and skewing the estimate by ~k/(k-1)
        # (code-review r5). COUNT(DISTINCT) semantics ignore NULL —
        # so does the sketch.
        .where(F.col("h").isNotNull())
        .distinct()
    )
    return k_smallest(hashed, k, tuple(group_cols))


def kmv_merge(
    *sketches: DataFrame, k: int = 64, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge sketches: union the retained hashes, dedupe, re-take the
    k smallest per group. Exact (≡ one-shot build over the combined
    input) because the k smallest of A ∪ B all lie within
    k-min(A) ∪ k-min(B). Merging many shard sketches re-uses the
    salted two-level rank, so even a million-shard union never sorts
    in one task."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return k_smallest(out.distinct(), k, tuple(group_cols))


def kmv_estimate(
    sketch: DataFrame, *, k: int = 64, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Collapse a sketch to per-group ``(n_sketch, kmv_raw)``.

    ``kmv_raw`` is the UNROUNDED estimate — a single IEEE division of
    exactly-representable doubles, bitwise identical cross-engine;
    display rounding is the caller's (scale-then-divide, per the
    authoring rules)."""
    scale = float((k - 1) << _KMV_BITS)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.max("h").alias("_hk"),
    )
    return agg.select(
        *group_cols,
        "n_sketch",
        F.when(
            F.col("n_sketch") < k, F.col("n_sketch").cast("double")
        )
        .otherwise(F.lit(scale) / F.col("_hk").cast("double"))
        .alias("kmv_raw"),
    )
