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
        # Older driver testdata stored events.ts as TIMESTAMP(NANOS),
        # which Spark's reader rejects. Read nanos as long and
        # floor-convert to micros — identical to DuckDB's ns→us
        # truncation, so oracle-safe.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(raw.dtypes).get("ts") == "bigint":
            raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _normalize_ntz(spark, raw)


def _normalize_ntz(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Cast any timestamp_ntz column to timestamp (LTZ).

    The driver parquet stores naive micros (isAdjustedToUTC=false);
    Spark 4 infers those as TIMESTAMP_NTZ, which `unix_micros`,
    `window`, and friends reject. The DuckDB oracle treats the same
    values as UTC instants, so the correct reading is "wall clock IS
    UTC": pin the session timezone to UTC (idempotent, runtime-safe)
    and cast — the stored micros are then preserved bit-for-bit.
    """
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz_cols:
        return df
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return df.withColumns(
        {c: F.col(c).cast("timestamp") for c in ntz_cols}
    )


def register_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    out = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
