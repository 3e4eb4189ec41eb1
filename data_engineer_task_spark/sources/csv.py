"""CSV source (reference T1, ``task.py:69-70``).

The reference does ``pd.read_csv(path)`` — header row, dtype inference,
RFC-4180 quoting. Spark-first version: explicit schema (no inference
pass), explicit quote/escape, ``multiLine`` for quoted embedded
newlines. pandas handles all of these silently; Spark must be told.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    *,
    header: bool = True,
    multi_line: bool = True,
) -> DataFrame:
    reader = (
        spark.read.option("header", header)
        .option("quote", '"')
        .option("escape", '"')  # RFC 4180 "" escaping, what pandas/excel emit
        .option("multiLine", multi_line)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)
