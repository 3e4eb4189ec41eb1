"""Twenty-fourth-batch declared queries: embedding feature-health
profiling and language-ID evaluation.

Same contract as plans/analytics.py (see its authoring rules): every
entry is a Spark program + a DuckDB oracle that must hash-match.

 - per-DIMENSION embedding profile (mean/sd/min/max per coordinate
   across the corpus — dead-dimension and scale-drift tripwires the
   per-VECTOR norm profile can't see)
 - language-ID confusion matrix (predicted vs labeled lang — the
   evaluation that turns the classifier entry into a monitored one)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import _LANG_KEYWORDS, _KW_SQL, _t, _t_wide, q


@q(
    "embedding_dimension_profile",
    """
    WITH x AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS q
      FROM embeddings
    ),
    s AS (
      SELECT dim,
             CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(q) AS BIGINT) AS sq,
             CAST(sum(q * q) AS BIGINT) AS sqq,
             CAST(min(q) AS BIGINT) AS mn,
             CAST(max(q) AS BIGINT) AS mx
      FROM x GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, n_vecs,
           round(sq * 10000.0 / n_vecs / 1000000.0) / 10000.0 AS mean_v,
           round(sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n_vecs)
                      / n_vecs) / 1000000.0 * 10000.0) / 10000.0 AS sd_v,
           round(mn * 10000.0 / 1000000.0) / 10000.0 AS min_v,
           round(mx * 10000.0 / 1000000.0) / 10000.0 AS max_v
    FROM s ORDER BY dim
    """,
)
def embedding_dimension_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION embedding health profile: mean / sd / min / max
    of every coordinate across the corpus — the monitor that catches
    dead dimensions (sd ≈ 0), scale drift between encoder versions,
    and clipped coordinates, none of which the per-vector
    `embedding_norm_profile` can see. Determinism engineering: floats
    are 1e-6-quantized IN-ROW to exact integers before any cross-row
    aggregation, so sums and sum-of-squares are exact (Σq² ≈
    4e10·rows — BIGINT-safe past 10⁶× this corpus) and the
    mean/sd derive from exact integers through identical fp ops on
    both engines. Plan: posexplode fan-out (rows × 64 — in-row), then
    ONE map-side-combinable aggregate to a |dims|-row frame; at
    100 TB this is a single pass with a 64-row shuffle."""
    emb = _t_wide(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(
            F.transform(
                "embedding",
                lambda v: F.round(v.cast("double") * 1000000.0).cast("long"),
            )
        ).alias("dim", "q")
    )
    s = x.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
        F.min("q").cast("long").alias("mn"),
        F.max("q").cast("long").alias("mx"),
    )
    sd = F.sqrt(
        (
            F.col("sqq").cast("double")
            - F.col("sq").cast("double") * F.col("sq") / F.col("n_vecs")
        )
        / F.col("n_vecs")
    )
    return s.select(
        F.col("dim").cast("long").alias("dim"),
        "n_vecs",
        (F.round(F.col("sq") * 10000.0 / F.col("n_vecs") / 1000000.0) / 10000.0).alias(
            "mean_v"
        ),
        (F.round(sd / 1000000.0 * 10000.0) / 10000.0).alias("sd_v"),
        (F.round(F.col("mn") * 10000.0 / 1000000.0) / 10000.0).alias("min_v"),
        (F.round(F.col("mx") * 10000.0 / 1000000.0) / 10000.0).alias("max_v"),
    ).orderBy("dim")


@q(
    "lang_id_confusion",
    f"""
    WITH s AS (
      SELECT lang AS actual_lang,
             round((len(list_filter(string_split(text, ' '),
                                   t -> t IN {_KW_SQL["de"]}))::DOUBLE
                   / len(string_split(text, ' '))) * 10000.0) / 10000.0
               AS score_de,
             round((len(list_filter(string_split(text, ' '),
                                   t -> t IN {_KW_SQL["en"]}))::DOUBLE
                   / len(string_split(text, ' '))) * 10000.0) / 10000.0
               AS score_en
      FROM documents
    ),
    p AS (
      SELECT actual_lang,
             CASE WHEN score_de >= score_en THEN 'de' ELSE 'en' END
               AS predicted_lang
      FROM s
    )
    SELECT actual_lang, predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) * 10000.0
                 / sum(count(*)) OVER (PARTITION BY actual_lang)) / 10000.0
             AS share_of_actual
    FROM p GROUP BY actual_lang, predicted_lang
    ORDER BY actual_lang, predicted_lang
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the keyword-density language classifier
    against the labeled `lang` column — the evaluation loop that the
    `doc_language_id` entry needs before anyone trusts it in a
    curation gate (same closure pattern as `embedding_ann_recall` and
    `lsh_recall_vs_exact`: every classifier/approximation entry gets
    a measured-quality sibling). The true label rides the SAME
    projection as the scores — no join back onto the corpus, so the
    plan stays map-only into one (actual × predicted)-bounded
    aggregate; share_of_actual (row-normalized recall when actual =
    predicted) is an exact integer ratio under a display round, via a
    window over the cell frame, not the fact."""
    docs = _t_wide(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def density(kws):
        return (
            F.round(
                (
                    F.size(F.filter(toks, lambda t: t.isin(*kws))).cast("double")
                    / F.size(toks)
                )
                * 10000.0
            )
            / 10000.0
        )

    p = docs.select(
        F.col("lang").alias("actual_lang"),
        F.when(
            density(_LANG_KEYWORDS["de"]) >= density(_LANG_KEYWORDS["en"]), "de"
        )
        .otherwise("en")
        .alias("predicted_lang"),
    )
    from pyspark.sql import Window as W

    cell = p.groupBy("actual_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = F.sum("n_docs").over(W.partitionBy("actual_lang"))
    return cell.select(
        "actual_lang",
        "predicted_lang",
        "n_docs",
        (F.round(F.col("n_docs") * 10000.0 / tot) / 10000.0).alias(
            "share_of_actual"
        ),
    ).orderBy("actual_lang", "predicted_lang")
