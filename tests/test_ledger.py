"""Idempotency-ledger behavior (reference test_check_history, task.py:248-251)."""

from __future__ import annotations

from data_engineer_task_spark.sources.ledger import Ledger


def test_ledger_roundtrip(spark, tmp_path):
    led = Ledger(spark, str(tmp_path / "history"))
    assert not led.seen("netflix_titles.csv")
    assert led.check_and_record("netflix_titles.csv") is False  # first run: proceed
    assert led.seen("netflix_titles.csv")
    assert led.check_and_record("netflix_titles.csv") is True  # second run: skip
    assert not led.seen("other.csv")
