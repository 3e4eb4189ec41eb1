"""Partitioned-warehouse scale behavior: a predicate on the partition
column must prune directories at planning time (PartitionFilters), not
filter rows after a full scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_task_spark.sources.catalog import load_table
from data_engineer_task_spark.sources.parquet import write_parquet

from conftest import SF_SMOKE


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = load_table(spark, SF_SMOKE, "orders")
    write_parquet(orders, out, mode="overwrite", partition_by=["o_orderstatus"])

    df = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "o_orderstatus" in pf_line  # pruned at planning, not post-scan

    expected = orders.where(F.col("o_orderstatus") == "F").count()
    assert df.count() == expected


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    import os

    from data_engineer_task_spark.sources.parquet import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # 64 tiny files — the post-streaming-ingest shape
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src == 64

    declared = compact_parquet(spark, src, dst, target_bytes=10**9)
    n_dst = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert declared == 1 and n_dst == 1
    # content survives byte-identically (count + checksum)
    a = spark.read.parquet(src).selectExpr("sum(id)", "count(*)").collect()[0]
    b = spark.read.parquet(dst).selectExpr("sum(id)", "count(*)").collect()[0]
    assert tuple(a) == tuple(b)
