"""Testdata catalog helpers: load driver parquet tables, register views.

Every table in TESTDATA.md is one parquet file under
``{sf_dir}/{name}.parquet``. ``register_testdata`` mirrors the DuckDB
oracle's pre-registered views so ``spark.sql`` text matches oracle SQL
table names one-for-one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    out = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
