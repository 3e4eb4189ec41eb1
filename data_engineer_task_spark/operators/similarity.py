"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline, and a
sign-LSH-bucketed variant as the scale path (candidates only within a
bucket — the 100 TB shape: bucket is the shuffle key, each bucket's
pair enumeration is local to a partition).

All arithmetic is native column expressions (``zip_with`` +
``aggregate`` fold in double precision, deterministic order) — no UDFs,
no collect. An IVF variant would assign vectors to broadcast centroids
with the same bucket-join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold — deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def with_norm(df: DataFrame, vec_col: str) -> DataFrame:
    v = as_double(F.col(vec_col))
    return df.withColumn("_v", v).withColumn("_norm", l2_norm(F.col("_v")))


def cosine_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    query_filter: Column,
    k: int = 3,
    round_to: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for the rows matching ``query_filter``
    against the whole table. Query side is broadcast (small by
    construction); ranking uses the ROUNDED similarity with an id
    tie-break so results are stable under fp reassociation."""
    base = with_norm(emb, vec_col)
    queries = base.where(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"),
    )
    pairs = base.join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
    cos = F.round(
        (dot(F.col("_qv"), F.col("_v")) / (F.col("_qnorm") * F.col("_norm"))),
        round_to,
    )
    scored = pairs.select(
        "query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc_nulls_last("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def sign_bucket(vec_col: str, n_bits: int = 6) -> Column:
    """Sign-LSH bucket id: concatenated sign bits of the leading dims.
    (A full random-hyperplane LSH replaces element_at with dot products
    against broadcast hyperplanes — same downstream shape.)"""
    bits = [
        F.when(F.element_at(F.col(vec_col), i) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(1, n_bits + 1)
    ]
    return F.concat(*bits)


def bucketed_similar_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_bits: int = 6,
    threshold: float = 0.0,
    round_to: int = 5,
) -> DataFrame:
    """ANN candidate pairs: self-join within sign-LSH buckets only.
    Output: bucket, id_a, id_b, cos_sim (id_a < id_b)."""
    base = with_norm(emb, vec_col).withColumn("bucket", sign_bucket(vec_col, n_bits))
    a = base.select(
        "bucket", F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), F.col("_norm").alias("_na")
    )
    b = base.select(
        "bucket", F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), F.col("_norm").alias("_nb")
    )
    pairs = a.join(b, ["bucket"]).where(F.col("id_a") < F.col("id_b"))
    cos = F.round(
        dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), round_to
    )
    return (
        pairs.select("bucket", "id_a", "id_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def _assign_to_centroids(
    base: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """Add a ``cluster`` (0-based argmin squared-L2, lowest-index
    tie-break) and ``_d2`` (that distance) column. The centroid matrix
    ships in the UDF closure (k×d — driver-side tiny), so this is a
    map-only stage: no join, no shuffle. Dense distance-to-all-
    centroids is the one place a vectorized Arrow UDF beats native
    column expressions: the k×d literal expression tree costs Catalyst
    planning + codegen per k-means iteration and evaluates
    element-by-element, while one numpy matmul per Arrow batch is
    O(n·k·d) in BLAS."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    # NOTE: legacy PandasUDFType form on purpose — PySpark 4.1 type-hint
    # inference rejects the Series -> DataFrame (struct result) shape.
    @F.pandas_udf("struct<cluster:int,d2:double>", F.PandasUDFType.SCALAR)
    def assign(vs):
        if len(vs) == 0:
            return pd.DataFrame({"cluster": pd.array([], dtype="int32"),
                                 "d2": pd.array([], dtype="float64")})
        V = np.asarray(vs.tolist(), dtype=np.float64)
        d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c_sq[None, :]
        cl = d2.argmin(axis=1)  # lowest-index tie-break, like array_position
        return pd.DataFrame(
            {
                "cluster": cl.astype("int32"),
                "d2": np.maximum(d2[np.arange(len(cl)), cl], 0.0),
            }
        )

    return base.withColumn("_a", assign("_v")).select(
        "*", F.col("_a.cluster").alias("cluster"), F.col("_a.d2").alias("_d2")
    ).drop("_a")


def kmeans_fit(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 8,
    n_iters: int = 5,
    round_to: int = 6,
) -> tuple[list[list[float]], DataFrame]:
    """Lloyd's k-means over a distributed embedding table. Per
    iteration: one map-only assignment pass (centroid literals — no
    join) plus one groupBy computing the d per-dimension means, then
    the k×d centroid table (tiny) returns to the driver. That loop
    shape is the canonical Spark iterative-ML pattern: only O(k·d)
    state ever crosses the driver boundary, so it scales to any row
    count. Determinism: init = the k lowest-``id_col`` vectors;
    centroids rounded to ``round_to`` decimals each iteration (pins
    down fp summation-order noise); empty clusters keep their previous
    centroid. Returns (centroids, assignment DataFrame with
    ``cluster`` and squared distance ``_d2``)."""
    base = emb.select(
        id_col, as_double(F.col(vec_col)).alias("_v")
    ).persist()
    init = base.orderBy(id_col).limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need >= {k} vectors, got {len(init)}")
    dim = len(init[0]["_v"])
    centroids = [[round(float(x), round_to) for x in r["_v"]] for r in init]
    for _ in range(n_iters):
        assigned = _assign_to_centroids(base, centroids)
        rows = (
            assigned.groupBy("cluster")
            .agg(*[F.avg(F.element_at("_v", d + 1)).alias(f"c{d}") for d in range(dim)])
            .collect()
        )
        new = {
            r["cluster"]: [round(float(r[f"c{d}"]), round_to) for d in range(dim)]
            for r in rows
        }
        centroids = [new.get(c, centroids[c]) for c in range(k)]
    return centroids, _assign_to_centroids(base, centroids)


def ivf_assign(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    centroid_filter: Column,
    round_to: int = 5,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its
    highest-cosine centroid (centroids broadcast). On a real corpus the
    centroids come from k-means over a sample; here any deterministic
    seed set works (``centroid_filter``), since the operator under test
    is the assignment join, not the training.
    Output: (id, centroid_id, cos_sim)."""
    base = with_norm(emb, vec_col)
    cents = base.where(centroid_filter).select(
        F.col(id_col).alias("centroid_id"),
        F.col("_v").alias("_cv"),
        F.col("_norm").alias("_cnorm"),
    )
    cos = F.round(
        dot(F.col("_cv"), F.col("_v")) / (F.col("_cnorm") * F.col("_norm")), round_to
    )
    scored = base.join(F.broadcast(cents), F.lit(True)).select(
        F.col(id_col), F.col("centroid_id"), cos.alias("cos_sim")
    )
    w = W.partitionBy(id_col).orderBy(F.desc_nulls_last("cos_sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
