"""Twenty-sixth-batch declared queries: driver-gate coverage for the
distributed connected-components escalation path.

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
