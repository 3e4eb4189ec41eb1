"""Sixth-batch declared queries: streaming session windows, incremental
aggregate maintenance, k-anonymity, and cluster-quality scoring.

Same contract as plans/analytics.py (see its authoring rules): every
entry is a Spark program + a DuckDB oracle that must hash-match.
Surface added here:

 - native ``session_window`` as a REAL streaming query in append mode
   (exactly-once emission when the watermark proves a session closed —
   the streaming twin of the batch `user_session_spans` entry)
 - incremental aggregate maintenance: partial aggregates of disjoint
   slices algebraically merged, proven equal to a full recompute (the
   pattern that lets a 100 TB rollup absorb a new partition without
   rescanning history)
 - k-anonymity profiling (privacy-risk grouping on quasi-identifiers —
   the governance sibling of the PII scrub operators)
 - simplified silhouette per label (cluster-quality metric over the
   embeddings table — centroid-based, so it stays linear in points
   instead of the textbook O(n²) pairwise form)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import _t, _t_wide, q


@q(
    "stream_user_sessions",
    """
    WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
    b AS (SELECT max(us) - 2460000000 AS cutoff FROM e),
    o AS (
      SELECT user_id, us,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                       > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    s AS (
      SELECT user_id, us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM o
    ),
    g AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             min(us) AS start_us, max(us) AS end_us
      FROM s GROUP BY user_id, sess
    )
    SELECT g.user_id, g.n_events, g.start_us, g.end_us
    FROM g, b WHERE g.end_us <= b.cutoff
    ORDER BY user_id, start_us
    """,
)
def stream_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session spans from a REAL Structured Streaming run of
    the native ``session_window`` aggregation (append mode: one row per
    CLOSED session, emitted only when the watermark proves no further
    event can extend it). The oracle is the batch gaps-and-islands
    sessionizer with the same closed gap boundary, trimmed to the same
    watermark finality cutoff (10 min delay + 30 min gap + 1 min edge
    margin = the 2 460 000 000 µs in the SQL) — see
    ``run_stream_sessions_once`` for the emission mechanics."""
    from ..streaming.aggregate import run_stream_sessions_once

    return run_stream_sessions_once(
        spark, f"{sf_dir}/events.parquet", "stream_sessions_out"
    )


@q(
    "orders_incremental_agg_merge",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           round(sum(o_totalprice) / count(*), 4) AS avg_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def orders_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the orders fact is split into
    a 'history' slice and a 'new-partition' slice, each reduced to
    per-priority PARTIAL aggregates (count/sum/min/max — all algebraic:
    their merge is itself count-sum/sum/min/max, and avg derives from
    the merged sum and count), then the partials are merged WITHOUT
    touching the underlying rows again. The oracle recomputes from the
    full table in one pass — hash equality proves merge ≡ recompute,
    which is the contract that lets a materialized 100 TB rollup absorb
    each new ingest slice at the cost of aggregating ONLY that slice.
    (The same decomposition is what Spark's own partial aggregation
    does inside one query; here it is made explicit ACROSS queries,
    i.e. across time. Non-algebraic aggregates need sketch
    intermediates instead — the HLL/bitmap/CMS entries.)"""
    orders = _t(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("date")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("o_totalprice").alias("ps"),
            F.min("o_totalprice").alias("pmin"),
            F.max("o_totalprice").alias("pmax"),
        )

    history = partial(orders.where(F.col("o_orderdate") < cut))
    delta = partial(orders.where(F.col("o_orderdate") >= cut))
    return (
        history.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("pn").cast("long").alias("n_orders"),
            F.round(F.sum("ps"), 2).alias("total_price"),
            F.min("pmin").alias("min_price"),
            F.max("pmax").alias("max_price"),
            F.round(F.sum("ps") / F.sum("pn"), 4).alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


@q(
    "customer_k_anonymity",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bucket,
           CAST(count(*) AS BIGINT) AS group_size,
           CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS at_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / 2000)
    ORDER BY c_nationkey, c_mktsegment, bal_bucket
    """,
)
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the quasi-identifier tuple
    (nation, market segment, coarse balance bucket): any equivalence
    class smaller than k re-identifies its members under linkage
    attacks, so releases must suppress or generalize those rows. One
    hash aggregate over the dimension — the privacy sibling of the PII
    scrub operators (`scrub_pii` redacts direct identifiers; this
    measures the indirect ones). At 100 TB the group count is bounded
    by the quasi-identifier domain, not the fact, so the audit is one
    map-combined shuffle like any low-cardinality rollup."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_bucket",
            "group_size",
            F.when(F.col("group_size") < 5, 1).otherwise(0).alias("at_risk"),
        )
        .orderBy("c_nationkey", "c_mktsegment", "bal_bucket")
    )


@q(
    "embedding_silhouette_by_label",
    """
    WITH dims AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    cent AS (
      SELECT label AS clabel, dim, avg(x) AS c FROM dims GROUP BY label, dim
    ),
    dist AS (
      SELECT d.vec_id, d.label, c.clabel,
             sqrt(sum((d.x - c.c) * (d.x - c.c))) AS dist
      FROM dims d JOIN cent c ON d.dim = c.dim
      GROUP BY d.vec_id, d.label, c.clabel
    ),
    ab AS (
      SELECT vec_id, label,
             min(CASE WHEN label = clabel THEN dist END) AS a,
             min(CASE WHEN label <> clabel THEN dist END) AS b
      FROM dist GROUP BY vec_id, label
    ),
    s AS (
      SELECT label,
             CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
                  ELSE 0 END AS s
      FROM ab
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(s) * 10000) / 10000 AS silhouette
    FROM s GROUP BY label ORDER BY label
    """,
)
def embedding_silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per label: a = distance
    to the own-label centroid, b = distance to the nearest other
    centroid, s = (b−a)/max(a,b) — the standard O(n·k·d) surrogate for
    the O(n²·d) pairwise silhouette, and the go-to label-quality /
    cluster-separation score for an embedded corpus. The plan shape is
    scale-honest: centroids are a (k×d)-bounded aggregate; each point
    meets only the k centroids (dimension-keyed join + per-(point,
    centroid) reduce), never another point. Positive silhouette ⇒ the
    label is closer to its own centroid than to any other — a gate for
    'are these labels worth training on'."""
    emb = _t_wide(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.transform("embedding", lambda v: v.cast("double"))).alias(
            "dim", "x"
        ),
    )
    cent = (
        dims.groupBy(F.col("label").alias("clabel"), "dim")
        .agg(F.avg("x").alias("c"))
    )
    dist = (
        dims.join(cent, "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sqrt(F.sum((F.col("x") - F.col("c")) ** 2)).alias("dist"))
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("label") == F.col("clabel"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("label") != F.col("clabel"), F.col("dist"))).alias("b"),
    )
    s = ab.select(
        "label",
        F.when(
            F.greatest("a", "b") > 0,
            (F.col("b") - F.col("a")) / F.greatest("a", "b"),
        )
        .otherwise(F.lit(0.0))
        .alias("s"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            (F.round(F.avg("s") * 10000) / 10000).alias("silhouette"),
        )
        .orderBy("label")
    )
