"""Parquet source/sink — the engine's warehouse format.

Replaces the reference's Postgres warehouse (T2/T3, ``task.py:143-166``):
``df.to_sql(if_exists='append')`` becomes an append-mode parquet write.
Parquet gives us column pruning + predicate pushdown for free, which the
reference's row-oriented heap tables never had.

At 100 TB the knobs that matter: partition columns chosen so common
predicates prune whole directories, and target file sizes ~128-512 MB
(``maxRecordsPerFile`` / upstream ``repartition``) so the scan
parallelism matches the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
