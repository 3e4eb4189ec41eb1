"""JSON-lines source/sink.

The reference ingests only CSV (``task.py:69-70``); any event or
document pipeline also lands JSONL. Reads take an EXPLICIT schema:
schema inference on JSON costs a full extra pass over the data (fatal
at 100 TB) and silently widens types between batches — the same reason
``sources/csv.py`` prefers explicit StructTypes. Writes stay
line-delimited (one object per line), the only JSON layout that splits
across tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    timestamp_format: str | None = None,
) -> DataFrame:
    """Read line-delimited JSON with a declared schema. Malformed lines
    go to PERMISSIVE nulls by default (Spark's default mode) — pair
    with a ``columnNameOfCorruptRecord`` audit column when the feed is
    untrusted."""
    reader = spark.read.schema(schema)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = "gzip",
) -> None:
    """Write line-delimited JSON (one dir of part files; splittable on
    read when uncompressed, per-file-parallel when gzipped)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
