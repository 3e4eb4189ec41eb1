"""XML source/sink (Spark 4 native ``xml`` format).

The reference ingests only CSV (``task.py:69-70``); enterprise feeds
(catalog exports, legacy B2B interchange) still arrive as XML. Spark
4 ships the former spark-xml package as a built-in source, so no
extra jar is needed. Reads take an EXPLICIT schema for the same
reason as ``sources/jsonl.py``: inference costs a full extra pass
(fatal at 100 TB) and silently widens types between batches. Row
granularity is the ``rowTag`` element; files split by row boundaries
so reads stay task-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    row_tag: str = "row",
) -> DataFrame:
    """Read XML with a declared schema, one DataFrame row per
    ``row_tag`` element. Malformed elements go to PERMISSIVE nulls
    (Spark's default mode) — pair with ``columnNameOfCorruptRecord``
    when the feed is untrusted."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(schema)
        .load(path)
    )


def write_xml(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    row_tag: str = "row",
    root_tag: str = "rows",
    partition_by: list[str] | None = None,
) -> None:
    """Write XML (one dir of part files, each a ``root_tag`` document
    of ``row_tag`` elements)."""
    writer = (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
