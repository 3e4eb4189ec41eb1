"""Testdata catalog helpers: load driver parquet tables, register views.

Every table in TESTDATA.md is one parquet file under
``{sf_dir}/{name}.parquet``. ``register_testdata`` mirrors the DuckDB
oracle's pre-registered views so ``spark.sql`` text matches oracle SQL
table names one-for-one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's reader
        # rejects. Read nanos as long and floor-convert to micros —
        # identical to DuckDB's ns→us truncation, so oracle-safe.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(raw.dtypes).get("ts") == "bigint":
            return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return raw
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
