"""Fourth-batch declared queries: regression aggregates, bitmap
exact-distinct, a grouped-agg pandas UDAF, and denylist scrubbing.

Same contract as plans/analytics.py (see its authoring rules): every
entry is a Spark program + a DuckDB oracle that must hash-match. These
fill the remaining surface gaps called out in COVERAGE.md:

 - linear-regression aggregates (``regr_slope``/``regr_intercept``/
   ``regr_r2`` — the moment-decomposed, map-side-combinable trend fit)
 - exact distinct counting via mergeable roaring-style bitmaps
   (``bitmap_construct_agg``/``bitmap_count`` — the exact counterpart
   of the HLL sketch family in test_scale_patterns)
 - a custom Arrow-batched aggregate (grouped-agg ``pandas_udf`` —
   the UDAF surface; the reference's only custom functions were scalar
   UDFs, ``task.py:43-60``)
 - corpus denylist scrubbing (literal-term redaction + hit profile —
   the blocklist-filter stage of a training-data curation pipeline;
   the regex PII variant lives in operators/text.py::scrub_pii and is
   unit-tested on constructed rows because the synthetic corpus
   contains no PII-shaped spans)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import _t, q


@q(
    "priority_price_trend",
    """
    SELECT o_orderpriority,
           CAST(regr_count(o_totalprice, dayofyear(o_orderdate)) AS BIGINT)
             AS n_orders,
           round(regr_slope(o_totalprice,
                            CAST(dayofyear(o_orderdate) AS DOUBLE)), 4)
             AS slope,
           round(regr_intercept(o_totalprice,
                                CAST(dayofyear(o_orderdate) AS DOUBLE)), 2)
             AS intercept,
           round(regr_r2(o_totalprice,
                         CAST(dayofyear(o_orderdate) AS DOUBLE)), 6) AS r2
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def priority_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority least-squares trend of order price over day-of-year
    via the SQL regression aggregates. regr_* decompose into running
    co-moments (n, Σx, Σy, Σxy, Σx², Σy²), so the whole fit is one
    hash aggregate with map-side partial combine — no per-group data
    movement beyond the six doubles, which is why this shape holds at
    100 TB while a per-group ``collect + np.polyfit`` would not."""
    orders = _t(spark, sf_dir, "orders")
    x = F.dayofyear("o_orderdate").cast("double")
    y = F.col("o_totalprice")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.regr_count(y, x).cast("long").alias("n_orders"),
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 2).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
        )
        .orderBy("o_orderpriority")
    )


@q(
    "event_user_bitmap_distinct",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def event_user_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type computed the mergeable way:
    ids bucket into fixed 32k-bit bitmaps (``bitmap_bucket_number``),
    each (type, bucket) group ORs its positions into one bitmap
    (``bitmap_construct_agg`` — associative, so partial aggregation
    combines map-side), and the per-type count is the sum of per-bucket
    popcounts (buckets partition the id space, so the sum is exact).
    This is the exact counterpart of the HLL sketch family: the same
    two-level partial-merge shape count(DISTINCT) itself plans to, but
    with a materializable, re-mergeable intermediate — the pattern for
    incremental distinct-user rollups over 100 TB of events. Oracle is
    plain COUNT(DISTINCT), proving the bitmap path exact."""
    ev = _t(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("n_users"))
        .orderBy("event_type")
    )


@q(
    "priority_geomean_price",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           round(exp(avg(ln(o_totalprice))), 2) AS geomean_price
    FROM orders WHERE o_totalprice > 0
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def priority_geomean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric-mean price per priority via a CUSTOM grouped-agg
    pandas UDAF — the one aggregate surface the inventory lacked. The
    UDAF is Arrow-batched (plans as ``ArrowAggregatePython``, never the
    banned row-at-a-time ``BatchEvalPython``); the scan still prunes to
    two columns and pushes the positive-price filter. Honest scale
    note: unlike JVM aggregates, pandas UDAFs get NO map-side partial
    combine — every row crosses the group shuffle — so a UDAF is the
    right tool only when the aggregate genuinely can't be decomposed
    into built-ins. This one CAN (the oracle's ``exp(avg(ln(x)))`` is
    the native partial-aggregating form); it's declared as a UDAF
    precisely to pin the custom-aggregate surface against the oracle.
    The log-mean-exp identity is the numerically stable form (a direct
    product of 1e6 prices overflows doubles). ANSI guard:
    positive-price filter on both sides keeps ``ln`` total."""
    @F.pandas_udf("double")
    def _geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    # Spark refuses to mix group-agg pandas UDFs with JVM aggregates in
    # one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row count rides
    # along as a second tiny UDAF instead of F.count.
    @F.pandas_udf("long")
    def _n(v: pd.Series) -> int:
        return len(v)

    orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            _n("o_totalprice").alias("n_orders"),
            F.round(_geomean("o_totalprice"), 2).alias("geomean_price"),
        )
        .orderBy("o_orderpriority")
    )


_DENY = (("customer", 8), ("spark", 5))  # term, length


@q(
    "doc_denylist_scrub",
    """
    WITH s AS (
      SELECT source,
             CAST((length(text) - length(replace(text, 'customer', ''))) / 8
                + (length(text) - length(replace(text, 'spark', ''))) / 5
                  AS BIGINT) AS hits,
             length(replace(replace(text, 'customer', '[TERM]'),
                            'spark', '[TERM]')) AS residual_len
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(hits) AS BIGINT) AS total_hits,
           CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_hit,
           round(avg(residual_len), 2) AS avg_scrubbed_chars
    FROM s GROUP BY source ORDER BY source
    """,
)
def doc_denylist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist-term scrub profile per source: occurrence counts via
    the length-delta identity (pure codegen string ops — no regex
    engine in the loop) and the residual document length after
    replacing every denylist term with a [TERM] marker. Map-only until
    the final per-source rollup; at corpus scale the scrubbed text
    would be written back out and this profile is the audit artifact.
    The marker contains no denylist substring, so sequential replaces
    can't cascade. Regex-class scrubbing (emails/phones/IPs) is
    ``operators/text.py::scrub_pii``."""
    docs = _t(spark, sf_dir, "documents")
    hits = None
    scrubbed = F.col("text")
    for term, tlen in _DENY:
        h = (
            (F.length("text") - F.length(F.replace("text", F.lit(term))))
            / F.lit(tlen)
        ).cast("long")
        hits = h if hits is None else hits + h
        scrubbed = F.replace(scrubbed, F.lit(term), F.lit("[TERM]"))
    prof = docs.select(
        "source", hits.alias("hits"), F.length(scrubbed).alias("residual_len")
    )
    return (
        prof.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("hits").cast("long").alias("total_hits"),
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_docs_hit"),
            F.round(F.avg("residual_len"), 2).alias("avg_scrubbed_chars"),
        )
        .orderBy("source")
    )
