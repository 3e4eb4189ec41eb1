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
``operators/sampling.py``: ``h_j(token) = byte0(md5(j || ':' || token))``
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
    # Spark and SQL-oracle spellings in lockstep)
    return _md5_byte0(
        F.concat(jcol.cast("string"), F.lit(":"), token.cast("string"))
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
