"""Twenty-first-batch declared queries: corpus novelty scoring, dedup
threshold calibration, and market-concentration auditing.

Same contract as plans/analytics.py (see its authoring rules): every
entry is a Spark program + a DuckDB oracle that must hash-match.

 - n-gram novelty vs the growing corpus (what fraction of each doc's
   shingles appear here first — the diversity signal dedup thresholds
   are tuned against)
 - near-dup threshold sweep (pair counts surviving each candidate
   Jaccard cutoff, from ONE candidate generation — the calibration
   curve that picks a production threshold)
 - Herfindahl-Hirschman concentration index per region (in-row
   deterministic folds per CLAUDE.md's float rule)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .analytics import _SHINGLE_CTE, _near_dup_tail, _t, _t_wide, q


@q(
    "doc_ngram_novelty",
    f"""
    WITH {_SHINGLE_CTE},
    sets AS (SELECT DISTINCT doc_id, shingle FROM shf),
    nov AS (
      SELECT doc_id, shingle,
             min(doc_id) OVER (PARTITION BY shingle) AS first_doc
      FROM sets
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round((sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                  * 10000.0 / count(*))) / 10000.0 AS novelty
    FROM nov GROUP BY doc_id ORDER BY doc_id
    """,
)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty against the growing corpus: a doc's shingle is
    'novel' if no lower-id document contains it (ingestion order =
    doc_id), and the per-doc novelty fraction is the curation signal
    that separates fresh content from remix/boilerplate — the
    continuous cousin of the binary dedup verdict. Plan: ONE window
    (min doc_id per shingle — a single shuffle on shingle, map-side
    combinable) then the per-doc aggregate; no join against a
    vocabulary table at all. At 100 TB the shingle partition is the
    shuffle to watch — stopword-heavy shingles are the hot keys, and
    the same rare-first prefix trick the PPJoin entry uses (or a
    df-cap filter) bounds them; the window itself only computes min,
    so AQE's skew split applies cleanly."""
    docs = _t_wide(spark, sf_dir, "documents")
    from ..operators.text import shingles_from_text

    sets = (
        shingles_from_text(docs, "doc_id", "text", k=3)
        .select("doc_id", "shingle")
        .distinct()
    )
    nov = sets.withColumn(
        "first_doc", F.min("doc_id").over(W.partitionBy("shingle"))
    )
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        nov.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            novel.cast("long").alias("n_novel"),
            (
                F.round(novel * 10000.0 / F.count(F.lit(1))) / 10000.0
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@q(
    "near_dup_threshold_sweep",
    f"""
    WITH {_SHINGLE_CTE},
    {_near_dup_tail(band_size=2, as_cte=True)}
    SELECT CAST(t.threshold AS DOUBLE) AS threshold,
           CAST(sum(CASE WHEN p.jaccard >= CAST(t.threshold AS DOUBLE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
    FROM pairs p,
         (VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.3 AS DOUBLE)),
                 (CAST(0.5 AS DOUBLE)), (CAST(0.7 AS DOUBLE)),
                 (CAST(0.9 AS DOUBLE))) t(threshold)
    GROUP BY t.threshold ORDER BY threshold
    """,
)
def near_dup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold calibration: how many candidate pairs survive
    each Jaccard cutoff, computed from ONE candidate generation + ONE
    verification pass (the expensive work) with a 5-row literal
    threshold frame cross-joined on top (broadcast-scalar piggyback —
    the same pattern as the other VALUES cross joins, never a data×
    data product). Reading the curve's elbow is how a production
    pipeline picks its threshold instead of guessing; re-running the
    whole pipeline per candidate threshold would cost 5× for the same
    answer."""
    from ..operators.dedup import near_duplicates

    docs = _t_wide(spark, sf_dir, "documents")
    pairs = near_duplicates(
        docs, "doc_id", "text", n_hashes=8, shingle_k=3, band_size=2
    )
    thresholds = F.explode(
        F.array(*[F.lit(t) for t in (0.1, 0.3, 0.5, 0.7, 0.9)])
    ).alias("threshold")
    return (
        pairs.select("jaccard", thresholds)
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(F.col("jaccard") >= F.col("threshold"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_pairs")
        )
        .orderBy("threshold")
    )


@q(
    "nation_revenue_hhi",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             round(sum(o.o_totalprice) * 100.0) / 100.0 AS rev_c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name
    ),
    folded AS (
      SELECT region,
             CAST(count(*) AS BIGINT) AS n_nations,
             list(rev_c ORDER BY nation ASC) AS revs
      FROM rev GROUP BY region
    )
    SELECT region, n_nations,
           round((list_reduce(list_transform(revs,
                    x -> pow(x / list_reduce(revs, (a, b) -> a + b), 2)),
                    (a, b) -> a + b)) * 1000000.0) / 1000000.0 AS hhi,
           round((list_max(revs) / list_reduce(revs, (a, b) -> a + b))
                 * 1000000.0) / 1000000.0 AS top_share
    FROM folded ORDER BY region
    """,
)
def nation_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index: per region, the sum
    of squared nation revenue shares (1/n = perfectly even, 1.0 =
    monopoly) plus the top nation's share — the standard audit for
    'is this region's revenue dangerously concentrated'. Float
    discipline per CLAUDE.md: shares derive from cents-quantized
    revenues, and both the total and the Σshare² fold IN-ROW over a
    nation-name-ordered list (`F.aggregate` ↔ DuckDB `list_reduce`,
    both left folds) — no grouped float sum whose partition order
    could flip a display digit. The fact aggregate is the only big
    shuffle; everything after runs on the |region|×|nation| frame."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg((F.round(F.sum("o_totalprice") * 100.0) / 100.0).alias("rev_c"))
    )
    folded = rev.groupBy("region").agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("nation", "rev_c"))),
            lambda x: x["rev_c"],
        ).alias("revs"),
    )
    tot = F.aggregate("revs", F.lit(0.0), lambda a, b: a + b)
    hhi = F.aggregate(
        F.transform("revs", lambda x: F.pow(x / tot, 2)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return folded.select(
        "region",
        "n_nations",
        (F.round(hhi * 1000000.0) / 1000000.0).alias("hhi"),
        (F.round((F.array_max("revs") / tot) * 1000000.0) / 1000000.0).alias(
            "top_share"
        ),
    ).orderBy("region")


@q(
    "stream_sliding_event_counts",
    """
    WITH s AS (
      SELECT event_type, value,
             to_timestamp((epoch_ns(ts) // 1000000000 // 1800) * 1800) AS w0
      FROM events
    ),
    w AS (
      SELECT event_type, value,
             unnest([w0, w0 - INTERVAL 30 MINUTE]) AS ws
      FROM s
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round((sum(value)) * 100.0) / 100.0 AS total_value
    FROM w GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def stream_sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sliding-window aggregation executed as a REAL Structured
    Streaming query (parquet file source, multiple micro-batches,
    memory sink) — overlapping windows mean every event updates TWO
    window states, the shape the tumbling streaming twin
    (`stream_hourly_event_stats`) never exercises. Verified against
    the same batch SQL oracle as `sliding_event_counts`: streaming
    and batch must agree exactly."""
    from ..streaming.aggregate import run_stream_sliding_once

    return run_stream_sliding_once(
        spark, f"{sf_dir}/events.parquet", query_name="stream_sliding"
    )
