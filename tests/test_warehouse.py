"""Warehouse DDL parity (reference T3/T4: CREATE/DROP TABLE IF [NOT]
EXISTS) against the session catalog."""

from __future__ import annotations

from pyspark.sql import types as T

from data_engineer_task_spark.sources.warehouse import (
    append_table,
    create_table,
    drop_table,
    table_exists,
)

SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("n", T.LongType(), True),
    ]
)


def test_create_append_drop_roundtrip(spark):
    drop_table(spark, "wh_test")
    create_table(spark, "wh_test", SCHEMA)
    assert table_exists(spark, "wh_test")
    create_table(spark, "wh_test", SCHEMA)  # IF NOT EXISTS: idempotent

    append_table(spark.createDataFrame([("a", 1)], SCHEMA), "wh_test")
    append_table(spark.createDataFrame([("b", 2)], SCHEMA), "wh_test")
    assert spark.table("wh_test").count() == 2

    drop_table(spark, "wh_test")
    assert not table_exists(spark, "wh_test")
    drop_table(spark, "wh_test")  # IF EXISTS: idempotent
