"""Raw text corpus ingestion — the line-oriented crawl-dump reader.

The reference ingests only CSV (``task.py:69-70``); a training-data
pipeline's rawest input is plain text shards (one document per line).
This source turns a directory of ``*.txt`` shards into the engine's
``documents`` shape with DETERMINISTIC, content-addressed ids —
re-running ingestion over the same shards reproduces identical ids, so
downstream dedup / split / sample membership is stable across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(
    spark: SparkSession,
    path: str,
    *,
    min_chars: int = 1,
) -> DataFrame:
    """Read a text-shard directory as (doc_id, text, source, n_chars).

    Each FILE is read whole (``wholetext``) and split into lines
    in-row with ``posexplode`` — that makes the line ordinal
    deterministic (Spark's line-mode reader gives no stable offsets),
    and ``doc_id = xxhash64(file, line_no)`` is then reproducible and
    collision-safe at 64 bits for any real corpus. One row per file in
    flight means shards should be the usual 100 MB–1 GB crawl chunks,
    not single multi-TB files — exactly how such dumps ship; the
    post-explode repartition spreads lines across the cluster before
    any downstream compute.

    Blank / sub-``min_chars`` lines are dropped at the scan (a raw
    dump is full of them; they carry no signal and would all collide
    in content dedup)."""
    files = (
        # NOTE: must be the text() kwarg — DataFrameReader.option
        # ("wholetext") is silently ignored by the text source here.
        spark.read.text(path, wholetext=True)
        .select(
            F.col("_metadata.file_path").alias("source_file"),
            F.col("value").alias("body"),
        )
    )
    lines = files.select(
        "source_file",
        # \r?\n handles CRLF shards: stray \r would otherwise survive in
        # text (polluting content-hash dedup keys) and make blank CRLF
        # lines pass the min_chars filter as phantom one-char docs.
        F.posexplode(F.split(F.col("body"), r"\r?\n")).alias("line_no", "text"),
    )
    return (
        lines.where(F.length(F.trim(F.col("text"))) >= min_chars)
        .select(
            F.xxhash64(F.col("source_file"), F.col("line_no")).alias("doc_id"),
            F.col("text"),
            F.element_at(F.split(F.col("source_file"), "/"), -1).alias(
                "source"
            ),
            F.length(F.col("text")).cast("long").alias("n_chars"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
