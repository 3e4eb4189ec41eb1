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


def test_delete_where_rewrites_only_affected_files(spark, tmp_path):
    """Copy-on-write DELETE: matching rows disappear, files without
    matches stay byte-identical (same path, same mtime), and the
    NULL-predicate rows survive."""
    import os

    from pyspark.sql import functions as F

    from data_engineer_task_spark.sources.parquet import delete_where

    tbl = str(tmp_path / "tbl")
    # range-cluster on user_id so target keys live in FEW files
    df = spark.createDataFrame(
        [(i, i % 10 if i % 17 else None, f"p{i}") for i in range(1000)],
        "id long, user_id int, payload string",
    )
    df.repartitionByRange(8, "user_id").write.parquet(tbl)

    before = {
        f: os.path.getmtime(os.path.join(tbl, f))
        for f in os.listdir(tbl)
        if f.endswith(".parquet")
    }
    res = delete_where(spark, tbl, F.col("user_id") == 3)

    after = spark.read.parquet(tbl)
    assert after.where(F.col("user_id") == 3).count() == 0
    # null-predicate rows are KEPT
    assert after.where(F.col("user_id").isNull()).count() == 59
    expected_deleted = sum(1 for i in range(1000) if i % 17 and i % 10 == 3)
    assert res["rows_deleted"] == expected_deleted
    assert after.count() == 1000 - expected_deleted

    # untouched files: same path and mtime as before
    surviving = {
        f: os.path.getmtime(os.path.join(tbl, f))
        for f in os.listdir(tbl)
        if f.endswith(".parquet")
    }
    untouched = {f for f in surviving if f in before and surviving[f] == before[f]}
    assert len(untouched) == res["files_untouched"]
    assert res["files_untouched"] > 0  # range clustering confined the key
    assert res["files_rewritten"] >= 1

    # idempotent second delete: nothing matches, nothing rewritten
    res2 = delete_where(spark, tbl, F.col("user_id") == 3)
    assert res2 == {
        "rows_deleted": 0,
        "files_rewritten": 0,
        "files_untouched": len(surviving),
    }


def test_delete_where_refuses_hive_partitioned_tables(spark, tmp_path):
    """Rewriting a leaf file read directly would drop its partition
    columns — delete_where must refuse instead of corrupting."""
    import pytest
    from pyspark.sql import functions as F

    from data_engineer_task_spark.sources.parquet import delete_where

    tbl = str(tmp_path / "ptbl")
    spark.range(50).selectExpr("id", "id % 3 AS p").write.partitionBy(
        "p"
    ).parquet(tbl)
    with pytest.raises(ValueError, match="hive-partitioned"):
        delete_where(spark, tbl, F.col("id") == 7)
    # table untouched
    assert spark.read.parquet(tbl).count() == 50
