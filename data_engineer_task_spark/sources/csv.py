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
    multi_line: bool = False,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """``mode``: PERMISSIVE (malformed fields → null), DROPMALFORMED
    (skip bad rows), or FAILFAST (raise on first bad row — the ingest
    gate for feeds that must be clean). With ``corrupt_col`` (requires
    an explicit ``schema``), PERMISSIVE additionally captures each bad
    row's RAW text in that column for quarantine-table routing, so a
    100 TB ingest keeps its rejects auditable instead of silently
    nulled.

    ``multi_line`` defaults OFF because it makes every file
    single-task (a multiLine CSV can't be split at newlines) — zero
    intra-file parallelism on a big feed. Turn it on only for sources
    whose quoted fields genuinely embed newlines (the Netflix catalog
    does)."""
    reader = (
        spark.read.option("header", header)
        .option("quote", '"')
        .option("escape", '"')  # RFC 4180 "" escaping, what pandas/excel emit
        .option("multiLine", multi_line)
        .option("mode", mode)
    )
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col capture requires an explicit schema")
        schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)
