"""Twelfth-batch declared queries: growth accounting, the hashing
trick, audience composition, and inequality metrics.

Same contract as plans/analytics.py (see its authoring rules): every
entry is a Spark program + a DuckDB oracle that must hash-match.

 - month-over-month revenue waterfall (growth accounting: new /
   expansion / contraction / churned, reconciling start→end exactly)
 - feature hashing (the hashing trick) with a per-bucket collision
   profile over an engine-portable md5 bucket
 - daily new-vs-returning user split with the cumulative audience
 - Gini coefficient of customer revenue concentration (the
   inequality metric behind 'whale' analysis, next to ABC classes)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.sampling import _md5_byte0
from .analytics import _md5_byte_sql, _t, _t_wide, q


@q(
    "customer_revenue_waterfall",
    """
    WITH monthly AS (
      SELECT o_custkey AS c,
             year(o_orderdate) * 12 + month(o_orderdate) AS m,
             CAST(round(sum(o_totalprice) * 100.0) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey, year(o_orderdate) * 12 + month(o_orderdate)
    ),
    b AS (SELECT min(m) AS mn, max(m) AS mx FROM monthly),
    prev AS (SELECT c, m + 1 AS m, cents AS prev_c FROM monthly),
    cur AS (SELECT c, m, cents AS cur_c FROM monthly),
    pairs AS (
      SELECT coalesce(p.c, q.c) AS c, coalesce(p.m, q.m) AS m,
             p.prev_c, q.cur_c
      FROM prev p FULL OUTER JOIN cur q ON q.c = p.c AND q.m = p.m
    )
    SELECT m,
           CAST((m - 1) // 12 AS BIGINT) AS yr,
           CAST((m - 1) % 12 + 1 AS BIGINT) AS mo,
           CAST(sum(coalesce(prev_c, 0)) AS BIGINT) AS start_cents,
           CAST(sum(CASE WHEN prev_c IS NULL THEN cur_c ELSE 0 END) AS BIGINT)
             AS new_cents,
           CAST(sum(CASE WHEN prev_c IS NOT NULL AND cur_c > prev_c
                         THEN cur_c - prev_c ELSE 0 END) AS BIGINT)
             AS expansion_cents,
           CAST(sum(CASE WHEN prev_c IS NOT NULL AND cur_c IS NOT NULL
                              AND cur_c < prev_c
                         THEN prev_c - cur_c ELSE 0 END) AS BIGINT)
             AS contraction_cents,
           CAST(sum(CASE WHEN cur_c IS NULL THEN prev_c ELSE 0 END) AS BIGINT)
             AS churned_cents,
           CAST(sum(coalesce(cur_c, 0)) AS BIGINT) AS end_cents
    FROM pairs, b
    WHERE m > b.mn AND m <= b.mx
    GROUP BY m ORDER BY m
    """,
)
def customer_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: each month's revenue change decomposed per
    customer into new (no revenue last month), expansion (grew),
    contraction (shrank), and churned (no revenue this month) — the
    SaaS revenue-bridge/waterfall that explains WHY the top line
    moved, reconciling exactly as start + new + expansion −
    contraction − churned = end. The month-pair alignment is ONE
    full-outer self-join of the monthly aggregate shifted by one
    month (key = customer × month; never an orders×orders join).
    Revenue is cents-rounded ONCE per (customer, month) — everything
    downstream is exact BIGINT arithmetic, so the waterfall
    reconciles to the cent in both engines. First month is excluded
    (no prior month to bridge from); the m+1 phantom row the shift
    creates falls to the m <= max bound."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        "o_totalprice",
    )
    monthly = o.groupBy(F.col("o_custkey").alias("c"), "m").agg(
        F.round(F.sum("o_totalprice") * 100.0).cast("long").alias("cents")
    )
    b = monthly.agg(F.min("m").alias("mn"), F.max("m").alias("mx"))
    prev = monthly.select("c", (F.col("m") + 1).alias("m"), F.col("cents").alias("prev_c"))
    cur = monthly.select("c", "m", F.col("cents").alias("cur_c"))
    pairs = prev.join(cur, ["c", "m"], "full_outer")
    has_prev = F.col("prev_c").isNotNull()
    has_cur = F.col("cur_c").isNotNull()
    return (
        pairs.crossJoin(F.broadcast(b))
        .where((F.col("m") > F.col("mn")) & (F.col("m") <= F.col("mx")))
        .groupBy("m")
        .agg(
            F.sum(F.coalesce(F.col("prev_c"), F.lit(0))).cast("long").alias("start_cents"),
            F.sum(F.when(~has_prev, F.col("cur_c")).otherwise(0))
            .cast("long")
            .alias("new_cents"),
            F.sum(
                F.when(
                    has_prev & (F.col("cur_c") > F.col("prev_c")),
                    F.col("cur_c") - F.col("prev_c"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("expansion_cents"),
            F.sum(
                F.when(
                    has_prev & has_cur & (F.col("cur_c") < F.col("prev_c")),
                    F.col("prev_c") - F.col("cur_c"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("contraction_cents"),
            F.sum(F.when(~has_cur, F.col("prev_c")).otherwise(0))
            .cast("long")
            .alias("churned_cents"),
            F.sum(F.coalesce(F.col("cur_c"), F.lit(0))).cast("long").alias("end_cents"),
        )
        .select(
            "m",
            (((F.col("m") - 1) - (F.col("m") - 1) % 12) / 12).cast("long").alias("yr"),
            ((F.col("m") - 1) % 12 + 1).cast("long").alias("mo"),
            "start_cents",
            "new_cents",
            "expansion_cents",
            "contraction_cents",
            "churned_cents",
            "end_cents",
        )
        .orderBy("m")
    )


@q(
    "doc_feature_hashing",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    hashed AS (
      SELECT doc_id, token,
             {_md5_byte_sql("token", "fh:")} AS bucket
      FROM toks
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM hashed)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_instances,
           CAST(count(DISTINCT token) AS BIGINT) AS n_distinct_tokens,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           round(count(*) / tot.t * 1000000.0) / 1000000.0 AS corpus_share
    FROM hashed, tot
    GROUP BY bucket, tot.t ORDER BY bucket
    """,
)
def doc_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: tokens map to a fixed 256-dim feature space
    through a salted md5 bucket ('fh:' salt, engine-portable — the
    same property every sampling operator relies on), the way
    unbounded vocabularies become fixed-width model inputs without a
    vocabulary dictionary. The readout is the per-bucket collision
    profile: instances, distinct tokens sharing the bucket (the
    collision count that degrades feature quality), document reach,
    and corpus share. One (token-bucket) aggregate over the exploded
    corpus — map-side combinable, no vocabulary table to build,
    join, or broadcast, which is exactly why the trick scales: at
    100 TB the bucketing is a pure map stage regardless of how many
    distinct tokens exist."""
    docs = _t_wide(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).withColumn("bucket", _md5_byte0(F.col("token"), salt="fh:"))
    grouped = hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_instances"),
        F.countDistinct("token").cast("long").alias("n_distinct_tokens"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    # r11 optimization (guide §2.4; closes VERDICT r10 item 1): the r10
    # form computed the corpus total as grouped.agg(sum), crossJoined
    # back — but column pruning strips the countDistincts from the
    # total's branch, the two groupBy exchanges stop being identical,
    # ReuseExchange does NOT fire, and the plan kept TWO full
    # scan+explode+md5 subtrees (see plans/r11/doc_feature_hashing_
    # before.txt, operators (1) and (12)). An unpartitioned window
    # total over the grouped frame shares ONE subtree by construction;
    # its input is bounded by the fixed 256-bucket hash domain (one
    # md5 byte), so the single-task window sees <= 256 rows at any
    # corpus size (the house scalar-total-over-aggregated-frame
    # pattern; plans/audit.py::unpartitioned_specs documents why
    # order-less scalar totals are exempt from the window gate).
    tot = F.sum("n_instances").over(
        W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    ).cast("double")
    return (
        grouped
        .select(
            "bucket",
            "n_instances",
            "n_distinct_tokens",
            "n_docs",
            (
                F.round(F.col("n_instances") / tot * 1000000.0)
                / 1000000.0
            ).alias("corpus_share"),
        )
        .orderBy("bucket")
    )


@q(
    "daily_new_returning_users",
    """
    WITH e AS (
      SELECT user_id,
             CAST(epoch_ns(ts) // 1000 // 86400000000 AS BIGINT) AS day
      FROM events
    ),
    first_day AS (SELECT user_id, min(day) AS fd FROM e GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, day FROM e),
    daily AS (
      SELECT a.day,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CASE WHEN f.fd = a.day THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new
      FROM active a JOIN first_day f ON f.user_id = a.user_id
      GROUP BY a.day
    )
    SELECT day, n_active, n_new,
           n_active - n_new AS n_returning,
           CAST(sum(n_new) OVER (ORDER BY day ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumulative_users
    FROM daily ORDER BY day
    """,
)
def daily_new_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily audience composition: active users split into new (first
    ever activity that day) vs returning, plus the cumulative
    audience curve (running sum of new) — the first product metric
    any events pipeline ships, and the acquisition-side complement
    of `user_weekly_retention`. NO per-user join anywhere: new-user
    counts come from aggregating the first-day table BY DAY and
    joining day-grain to day-grain (two calendar-bounded frames — a
    per-user label join, broadcast or not, would move corpus-scale
    rows for a |days|-sized answer); the cumulative window runs over
    the |days|-bounded daily frame, never the fact table. All
    integers — exact in both engines."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    ).select(
        "user_id",
        ((F.col("us") - F.col("us") % 86400000000) / 86400000000)
        .cast("long")
        .alias("day"),
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("fd"))
    active = ev.distinct()
    daily_active = active.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    new_by_day = first_day.groupBy(F.col("fd").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    daily = daily_active.join(F.broadcast(new_by_day), "day", "left").select(
        "day",
        "n_active",
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
    )
    wcum = W.orderBy(F.asc("day")).rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day",
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).alias("n_returning"),
        F.sum("n_new").over(wcum).cast("long").alias("cumulative_users"),
    ).orderBy("day")


@q(
    "customer_revenue_gini",
    """
    WITH rev AS (
      SELECT o_custkey,
             CAST(round(sum(o_totalprice) * 100.0) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents ASC, o_custkey ASC) AS i
      FROM rev
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(cents) AS DOUBLE) AS s,
             CAST(sum(i * cents) AS DOUBLE) AS si
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           round(s / 100.0 * 100.0) / 100.0 AS total_revenue,
           round((2.0 * si / (n * s) - (n + 1.0) / n) * 1000000.0) / 1000000.0
             AS gini
    FROM m
    """,
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers —
    the scalar inequality metric behind whale/long-tail analysis,
    complementing `part_abc_classification` (which buckets; Gini
    measures). Uses the rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n
    over ascending-sorted revenue with customer-key tie-breaks.
    Per-customer revenue is cents-rounded BEFORE ranking, so ranks
    and both moment sums are exact-integer-derived and the final
    expression is bit-identical across engines. Ranks come from
    ``ordered_prefix`` (range-bucket two-level rank: approx-cut
    placement, exact-integer offsets — the r4 allowlist's documented
    swap, now landed), so no task ever sorts the whole customer
    frame; the Gini algebra is unchanged."""
    from ..operators.ranking import ordered_prefix

    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice") * 100.0).cast("long").alias("cents"))
    )
    ranked = ordered_prefix(
        rev, "cents", ["o_custkey"], rank_col="i", buckets=32
    ).select("cents", "i")
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("cents").cast("double").alias("s"),
        F.sum(F.col("i") * F.col("cents")).cast("double").alias("si"),
    )
    gini = 2.0 * F.col("si") / (F.col("n") * F.col("s")) - (
        F.col("n") + 1.0
    ) / F.col("n")
    return m.select(
        F.col("n").cast("long").alias("n_customers"),
        (F.round(F.col("s") / 100.0 * 100.0) / 100.0).alias("total_revenue"),
        (F.round(gini * 1000000.0) / 1000000.0).alias("gini"),
    )


# Thirteenth-batch entries register themselves into QUERIES/ORACLE on import.
from . import analytics_ext12  # noqa: E402,F401  isort:skip
