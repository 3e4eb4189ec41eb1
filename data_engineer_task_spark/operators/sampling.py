"""Deterministic sampling and corpus-packing operators.

Training-data pipelines need splits and chunking that are (a) stable
across runs and engines — reshuffling 100 TB must not reshuffle the
val set — and (b) derivable per-row, so they stay map-only. Both
operators here hash or window on existing columns; neither calls
``rand()`` (nondeterministic across retries/speculative tasks, the
classic silent-split-leak bug in Spark pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _md5_byte0(col: Column, salt: str = "") -> Column:
    """First md5 byte (0-255) of salt + stringified column — a uniform,
    engine-portable hash bucket (md5 hex is bit-identical everywhere;
    ``xxhash64``/``hash`` are not portable to the SQL oracle).

    ``salt`` makes each operator's hash INDEPENDENT. Without it, every
    md5(id)-prefix operator keeps the same low-byte rows: a 20%
    unsalted sample feeds hash_split nothing but 'train' rows (every
    survivor has byte0 < 52 < the 204 train cut) — composing sample +
    split would silently empty val/test."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    hv = lambda p: F.instr(F.lit(_HEX), F.substring(h, p, 1)) - 1  # noqa: E731
    return hv(1) * 16 + hv(2)


def hash_split(
    df: DataFrame,
    id_col: str,
    *,
    cuts: tuple[tuple[str, int], ...] = (("train", 204), ("val", 230), ("test", 256)),
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = first md5 byte
    of 'split:' + id, split = first label whose cut exceeds the bucket
    (204/256 ≈ 80%, 230/256 ≈ 90%). Map-only — no shuffle, no state;
    any engine that can md5 reproduces the exact membership."""
    b = _md5_byte0(F.col(id_col), salt="split:")
    expr = F.lit(cuts[-1][0])
    for label, cut in reversed(cuts[:-1]):
        expr = F.when(b < cut, F.lit(label)).otherwise(expr)
    return df.withColumn("split", expr)


def pack_token_budget(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    part_col: str,
    budget: int,
) -> DataFrame:
    """Context-window packing: within each ``part_col`` stream (docs
    ordered by id), assign chunk = floor(exclusive-running-token-count
    / budget) — every chunk holds ~budget tokens (the doc straddling a
    boundary goes to the earlier chunk). One shuffle on ``part_col``;
    the running sum is the standard single-window formulation, and at
    scale ``part_col`` (language/source/shard) bounds each partition's
    sort. Output: one row per (part, chunk) with doc/token totals."""
    n_tokens = F.size(F.split(F.col(text_col), " "))
    w = (
        W.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.select(part_col, id_col, n_tokens.alias("n_tokens"))
        .withColumn("chunk", F.floor(start / budget))
        .groupBy(part_col, "chunk")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


def stratified_hash_sample(
    df: DataFrame, id_col: str, *, fraction: float
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose first md5
    byte of 'strat:' + id falls under fraction*256. Same rows survive
    on every run, every engine, every partitioning — the property
    `df.sample()` (seeded per-partition RNG) loses the moment data
    moves. Stratify by grouping the RESULT on the stratum column:
    membership is per-row, so every stratum is sampled at the same rate
    without per-stratum passes. The salt decorrelates membership from
    hash_split's (see ``_md5_byte0``)."""
    cut = int(round(fraction * 256))
    return df.where(_md5_byte0(F.col(id_col), salt="strat:") < cut)


def _md5_uint16(col: Column, salt: str = "") -> Column:
    """First two md5 bytes (0-65535) of salt + stringified column —
    finer-grained portable uniform than ``_md5_byte0`` for
    probability-proportional acceptance tests."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    hv = lambda p: F.instr(F.lit(_HEX), F.substring(h, p, 1)) - 1  # noqa: E731
    return ((hv(1) * 16 + hv(2)) * 16 + hv(3)) * 16 + hv(4)


def weighted_hash_sample(
    df: DataFrame, id_col: str, weight_col: str, *, rate: float
) -> DataFrame:
    """Deterministic weight-proportional sample: row i survives with
    p_i = rate · N · w_i / W (capped at 1 implicitly), so the expected
    sample size is ``rate · N`` but heavy rows (long / high-quality
    documents) are preferentially kept — the standard
    importance-weighted corpus downsample.

    Acceptance is ``u_i · W < rate · N · w_i · 65536`` with
    ``u_i`` = first two md5 bytes of 'ws:' + id (salted so membership
    is independent of hash_split / stratified_hash_sample): one tiny
    count/sum aggregate broadcast back (no second pass over rows),
    then a map-only filter of IEEE-double products — bit-identical in
    any engine that can md5, so the membership is reproducible across
    runs, partitionings, and the SQL oracle.

    INTEGRAL-WEIGHT CONTRACT (code-review r5): membership compares
    against the corpus weight total W, and a float W re-associates
    across partitions run-to-run — the CLAUDE.md gate-flake class. W
    therefore accumulates as an exact BIGINT, which requires integral
    weights (cents/token-counts — what every house caller passes);
    fractional weights fail loudly instead of silently flaking.
    Quantize float weights at the call site first."""
    w_long = F.col(weight_col).cast("long")
    tot = df.agg(
        F.sum(w_long).cast("long").alias("_W"),
        F.count(F.lit(1)).cast("long").alias("_N"),
        F.sum(
            (F.col(weight_col).cast("double") != w_long.cast("double"))
            .cast("int")
        ).alias("_frac"),
    )
    u = _md5_uint16(F.col(id_col), salt="ws:").cast("double")
    ok = F.assert_true(
        F.coalesce(F.col("_frac"), F.lit(0)) == 0,
        F.lit(
            "weighted_hash_sample requires integral weights "
            "(quantize to cents/counts first) — float totals "
            "re-associate across partitions and flake membership"
        ),
    )
    return (
        df.crossJoin(F.broadcast(tot))
        .where(
            ok.isNull()
            & (
                u * F.col("_W").cast("double")
                < F.lit(float(rate))
                * F.col("_N").cast("double")
                * F.col(weight_col).cast("double")
                * F.lit(65536.0)
            )
        )
        .drop("_W", "_N", "_frac")
    )
