"""Scale smoke: drive the curation operators over a synthetic corpus
two orders of magnitude above the driver testdata (default 200k docs,
~50 MB of text) and print per-stage wall times.

Not part of the test suite (minutes, not seconds) — run on demand:

    python tools/scale_smoke.py [n_docs]

The corpus is generated deterministically IN SPARK (hash-arithmetic
token choice, no rand()), with planted structure: ~5% verbatim copies
(exact dups) and ~5% one-token-perturbed copies (near dups), so the
dedup stages have real work at every scale.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineer_task_spark.session import get_spark

VOCAB = [f"w{i:03d}" for i in range(500)]


def make_corpus(spark, n_docs: int):
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(30)),
                lambda i: F.element_at(
                    vocab, F.pmod(F.hash(F.col("id") * 31 + i), 500) + 1
                ),
            ),
            " ",
        ).alias("text"),
        F.concat(F.lit("lang"), (F.col("id") % 5).cast("string")).alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 7).cast("string")).alias("source"),
    )
    # plant dups against docs that KEEP their own text (doc_id % 20 == 0):
    # doc_id % 20 == 1 -> verbatim copy of doc_id-1 (exact dup pair);
    # doc_id % 20 == 2 -> doc_id-2's text + one extra token (near dup pair)
    prev1 = base.select(
        (F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("prev1")
    )
    prev2 = base.select(
        (F.col("doc_id") + 2).alias("doc_id"), F.col("text").alias("prev2")
    )
    return (
        base.join(prev1, "doc_id", "left")
        .join(prev2, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 20 == 1, F.col("prev1"))
            .when(
                F.col("doc_id") % 20 == 2,
                F.concat(F.col("prev2"), F.lit(" zznear")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("scale-smoke")
    work = tempfile.mkdtemp(prefix="scale_smoke_")
    src = os.path.join(work, "docs")

    t0 = time.perf_counter()
    make_corpus(spark, n_docs).repartition(32).write.parquet(src)
    docs = spark.read.parquet(src)
    print(f"generate+write {n_docs} docs: {time.perf_counter() - t0:.1f}s")

    from data_engineer_task_spark.operators.dedup import (
        content_hash_dedup,
        near_duplicates,
    )

    t0 = time.perf_counter()
    n_exact = content_hash_dedup(docs, "doc_id", "text").count()
    print(
        f"exact content dedup: {time.perf_counter() - t0:.1f}s "
        f"({n_docs - n_exact} dups found)"
    )

    t0 = time.perf_counter()
    n_pairs = near_duplicates(
        docs, "doc_id", "text", threshold=0.5
    ).count()
    spark.catalog.clearCache()
    print(f"minhash near-dup: {time.perf_counter() - t0:.1f}s ({n_pairs} pairs)")

    from data_engineer_task_spark.operators.dedup import jaccard_join_exact

    t0 = time.perf_counter()
    n_exact_pairs = jaccard_join_exact(
        docs, "doc_id", "text", threshold=0.5
    ).count()
    spark.catalog.clearCache()
    print(
        f"exact jaccard join (ppjoin): {time.perf_counter() - t0:.1f}s "
        f"({n_exact_pairs} pairs)"
    )

    from data_engineer_task_spark.operators.dedup import (
        lsh_match_against,
        minhash_signatures,
    )

    t0 = time.perf_counter()
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    n_inc = (
        lsh_match_against(
            minhash_signatures(corpus, "doc_id", "text"),
            minhash_signatures(batch, "doc_id", "text"),
            "doc_id",
        )
        .select("id_q")
        .distinct()
        .count()
    )
    spark.catalog.clearCache()
    print(
        f"incremental batch-vs-corpus dedup: {time.perf_counter() - t0:.1f}s "
        f"({n_inc} batch docs matched)"
    )

    # hot-bucket cap engaged (the 5% verbatim copies create real
    # signature collisions at every scale)
    t0 = time.perf_counter()
    n_capped = near_duplicates(
        docs, "doc_id", "text", threshold=0.5, max_bucket_size=1000
    ).count()
    spark.catalog.clearCache()
    print(
        f"minhash near-dup (bucket cap 1000): {time.perf_counter() - t0:.1f}s "
        f"({n_capped} pairs)"
    )

    from data_engineer_task_spark.operators.dedup import segment_dedup_rewrite

    t0 = time.perf_counter()
    rw = segment_dedup_rewrite(docs, "doc_id", "text", seg=10)
    n_docs_out, n_tok_kept, n_seg, n_seg_kept = rw.agg(
        F.count(F.lit(1)),
        F.sum("tokens_kept"),
        F.sum("n_segments"),
        F.sum("n_kept"),
    ).first()
    spark.catalog.clearCache()
    print(
        f"segment dedup rewrite: {time.perf_counter() - t0:.1f}s "
        f"({n_docs_out} docs, {n_seg - n_seg_kept}/{n_seg} segments dropped, "
        f"{n_tok_kept} tokens kept)"
    )

    from data_engineer_task_spark.plans.curation import (
        CurationConfig,
        CurationPipeline,
    )

    t0 = time.perf_counter()
    manifest = CurationPipeline(
        spark, os.path.join(work, "curated"), CurationConfig(near_dup_threshold=0.5)
    ).run(docs)
    print(f"full curation pipeline: {time.perf_counter() - t0:.1f}s")
    for s in manifest["stages"]:
        print(f"  {s['stage']}: {s['rows']}")
    print(f"  splits: {manifest['splits']}")


if __name__ == "__main__":
    main()
