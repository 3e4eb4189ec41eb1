"""CLI surface tests (Spark-free paths; the ETL flow itself is driven
end-to-end by test_netflix.py through NetflixPipeline)."""

from __future__ import annotations

from data_engineer_task_spark.cli import main


def test_cli_list_queries_prints_inventory(capsys):
    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "pricing_summary" in out
    assert "embedding_kmeans_clusters  (rows-only: no SQL oracle)" in out


def test_cli_unknown_query_exits_2(capsys):
    assert main(["query", "no_such_query"]) == 2
    assert "list-queries" in capsys.readouterr().err
