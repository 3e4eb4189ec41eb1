"""CLI surface tests (Spark-free paths; the ETL flow itself is driven
end-to-end by test_netflix.py through NetflixPipeline)."""

from __future__ import annotations

from data_engineer_task_spark.cli import main


def test_cli_list_queries_prints_inventory(capsys):
    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "pricing_summary" in out
    assert "embedding_kmeans_clusters" in out
    # every declared entry carries a DuckDB oracle since the kmeans/IVF
    # fixed-iteration unrolling landed — no rows-only rows remain
    assert "(rows-only: no SQL oracle)" not in out


def test_cli_unknown_query_exits_2(capsys):
    assert main(["query", "no_such_query"]) == 2
    assert "list-queries" in capsys.readouterr().err


def test_cli_etl_end_to_end_with_ledger_skip(spark, netflix_csv, tmp_path, caplog):
    """The reference's entry-point flow through OUR argparse surface:
    ingest → analytics log lines → second run skips ETL via the ledger
    (reference ``check_history``, task.py:231-240)."""
    import logging

    wh = str(tmp_path / "wh")
    with caplog.at_level(logging.INFO, logger="data_engineer_task_spark"):
        assert main(["-i", netflix_csv, "--warehouse", wh]) == 0
    text = caplog.text
    assert "shows with no crew: 299" in text
    assert "busiest month: December (833 titles)" in text

    caplog.clear()
    with caplog.at_level(logging.INFO, logger="data_engineer_task_spark"):
        assert main(["-i", netflix_csv, "--warehouse", wh]) == 0
    assert "ledger hit" in caplog.text

    # --force re-ingests by REPLACING, never appending a second copy
    # (duplicated star tables would silently double every answer)
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="data_engineer_task_spark"):
        assert main(["-i", netflix_csv, "--warehouse", wh, "--force"]) == 0
    assert "shows with no crew: 299" in caplog.text  # not 598
    shows = (
        spark.read.option("recursiveFileLookup", "true").parquet(f"{wh}/shows")
    )
    assert shows.count() == 7787


def test_cli_maintain_compact_and_zorder(spark, tmp_path, capsys):
    import glob

    src = str(tmp_path / "frag")
    # fragmented source: 8 tiny files
    spark.range(0, 2000).selectExpr(
        "id AS k", "CAST(id % 97 AS DOUBLE) AS v"
    ).repartition(8).write.parquet(src)

    out_c = str(tmp_path / "compacted")
    assert main(["maintain", "compact", src, out_c, "--target-mb", "256"]) == 0
    assert len(glob.glob(f"{out_c}/part-*.parquet")) == 1  # tiny table → 1 file
    assert spark.read.parquet(out_c).count() == 2000

    out_z = str(tmp_path / "zordered")
    assert main(["maintain", "zorder", src, out_z, "--cols", "k,v",
                 "--files", "4"]) == 0
    assert spark.read.parquet(out_z).count() == 2000
    assert "z-ordered" in capsys.readouterr().out


def test_cli_curate_runs_pipeline(spark, tmp_path, capsys):
    """`cli curate <in> <out>` drives the corpus pipeline and prints the
    stage funnel + split counts."""
    from data_engineer_task_spark.sources.catalog import load_table
    from conftest import SF_SMOKE

    src = str(tmp_path / "docs")
    load_table(spark, SF_SMOKE, "documents").limit(120).write.parquet(src)
    out = str(tmp_path / "curated_out")
    assert main(["curate", src, out, "--near-dup-threshold", "0.5"]) == 0
    printed = capsys.readouterr().out
    assert "input: 120 rows" in printed
    assert "splits:" in printed
    assert spark.read.parquet(f"{out}/curated").count() > 0


def test_cli_maintain_delete(spark, tmp_path, capsys):
    tbl = str(tmp_path / "dtbl")
    spark.range(100).selectExpr("id", "id % 5 AS k").repartitionByRange(
        4, "k"
    ).write.parquet(tbl)
    assert main(["maintain", "delete", tbl, "--where", "k = 2"]) == 0
    out = capsys.readouterr().out
    assert "deleted 20 row(s)" in out
    assert spark.read.parquet(tbl).where("k = 2").count() == 0
    assert spark.read.parquet(tbl).count() == 80
