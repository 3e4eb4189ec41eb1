"""ORC source/sink — the second columnar warehouse format Spark ships
native support for (vectorized reader, predicate pushdown, column
pruning — same scan contract as parquet). Kept API-symmetric with
``sources/parquet.py`` so a warehouse can be re-pointed by swapping the
writer call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
