"""Twenty-sixth-batch declared queries: driver-gate coverage for the
distributed connected-components escalation path, and ranking-metric
evaluation for curation quality scores.

Same contract as plans/analytics.py (see its authoring rules): every
entry is a Spark program + a DuckDB oracle that must hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import _SHINGLE_CTE, _near_dup_tail, _t_wide, q


@q(
    "near_dup_clusters_twophase",
    f"""
    WITH RECURSIVE {_SHINGLE_CTE},
    {_near_dup_tail(band_size=2, as_cte=True)},
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs WHERE jaccard >= 0.5
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM pairs WHERE jaccard >= 0.5
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach AS (
      SELECT node, node AS lbl FROM nodes
      UNION
      SELECT e.v AS node, r.lbl FROM reach r JOIN edges e ON e.u = r.node
    ),
    lab AS (SELECT node, min(lbl) AS cluster FROM reach GROUP BY node)
    SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(node) AS BIGINT) AS id_sum
    FROM lab GROUP BY cluster ORDER BY cluster
    """,
)
def near_dup_clusters_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`near_dup_clusters` driven through the Kiveris large-star/
    small-star two-phase variant (``strategy="two_phase"``) instead of
    the adaptive ladder — VERDICT r3 next-8: the O(log n)-round
    escalation path the ladder reaches only on deeper-than-max_iters
    graphs was pytest-pinned but never oracle-gated on real data.
    Identical oracle (recursive-CTE closure) and identical output to
    `near_dup_clusters`: the algorithms share one min-label fixpoint,
    so a hash match here proves the star-forest contraction — round
    alternation, checksum convergence, self-loop re-labeling — lands
    the exact same labels as the union-find. At 100 TB this is the
    variant that handles a pathological long-chain dup graph (O(log n)
    two-shuffle rounds; per-round eager localCheckpoint cuts the
    16×/round lineage growth)."""
    from ..operators.dedup import near_duplicates
    from ..operators.graph import connected_components

    docs = _t_wide(spark, sf_dir, "documents")
    pairs = near_duplicates(
        docs, "doc_id", "text", n_hashes=8, shingle_k=3, band_size=2,
        threshold=0.5,
    )
    labels = connected_components(
        pairs.select("id_a", "id_b"), strategy="two_phase"
    )
    return (
        labels.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("node").cast("long").alias("id_sum"),
        )
        .orderBy("cluster")
    )


@q(
    "doc_quality_score_auc",
    """
    WITH d AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS dtok
      FROM documents
    ),
    m AS (
      SELECT 'n_tokens' AS score_name, tok AS s, y FROM d
      UNION ALL
      SELECT 'n_distinct_tokens' AS score_name, dtok AS s, y FROM d
    ),
    g AS (
      SELECT score_name, s, CAST(sum(y) AS BIGINT) AS cp,
             CAST(sum(1 - y) AS BIGINT) AS cn
      FROM m GROUP BY score_name, s
    ),
    c AS (
      SELECT score_name, cp, cn,
             coalesce(sum(cn) OVER (PARTITION BY score_name ORDER BY s ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cl
      FROM g
    ),
    t AS (
      SELECT score_name,
             CAST(sum(cp) AS BIGINT) AS n_pos,
             CAST(sum(cn) AS BIGINT) AS n_neg,
             CAST(sum(cp * (2 * cl + cn)) AS BIGINT) AS u2
      FROM c GROUP BY score_name
    )
    SELECT score_name, n_pos, n_neg,
           round(u2 / (2.0 * n_pos * n_neg) * 1000000.0) / 1000000.0 AS auc
    FROM t ORDER BY score_name
    """,
)
def doc_quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking AUC (tie-corrected Mann-Whitney U) of candidate
    quality-score columns against a binary label — the standard
    offline gate for a model-based curation filter ("does this score
    actually rank the target slice above the rest?"), completing the
    eval family (recall / calibration / kappa / confusion had no
    threshold-free ranking metric). Here the label is lang='en' and
    the scores are token count and distinct-token count; any integer
    score plugs into the same shape.

    U is computed from per-score-value (c_pos, c_neg) counts:
    U2 = Σ_s c_pos(s)·(2·cum_neg_below(s) + c_neg(s)), AUC = U2 /
    (2·n_pos·n_neg) — the ×2 scaling keeps the half-credit tie term
    integral, so everything up to the final display division is EXACT
    BIGINT arithmetic (no rank window over the corpus, no float rank
    averaging): cross-engine identical by construction. At 100 TB:
    one map-only scoring pass, one groupBy on (score, value) whose
    output is score-cardinality-bounded (≪ corpus), and a window over
    that tiny frame — the corpus never sorts globally. The final AUC
    is two correctly-rounded IEEE ops on exact integers under the
    display round. Core math lives in
    ``operators/quality.py::ranking_auc`` (property-tested against an
    O(n²) pair-counting reference)."""
    from ..operators.quality import ranking_auc

    docs = _t_wide(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\Q \E")
    d = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.size(toks).cast("long").alias("tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("dtok"),
    )
    # in-row fan-out, not a union: one corpus scan serves both scores
    # (a union's branches each re-scan the fact table)
    m = d.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("n_tokens").alias("score_name"),
                    F.col("tok").alias("s"),
                ),
                F.struct(
                    F.lit("n_distinct_tokens").alias("score_name"),
                    F.col("dtok").alias("s"),
                ),
            )
        ).alias("e"),
        "y",
    ).select("e.score_name", "e.s", "y")
    return ranking_auc(
        m, "s", "y", group_cols=["score_name"]
    ).orderBy("score_name")
