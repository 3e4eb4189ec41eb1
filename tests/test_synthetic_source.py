"""Custom Python DataSource (batch + streaming) — determinism, schema,
partitioning, and micro-batch resume semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_task_spark.sources.synthetic import (
    SYNTH_SCHEMA,
    SyntheticEventsDataSource,
)


def _register(spark):
    spark.dataSource.register(SyntheticEventsDataSource)


def test_batch_read_schema_counts_and_partitioning(spark):
    _register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows_per_partition", 250)
        .option("num_partitions", 4)
        .load()
    )
    assert df.schema == SYNTH_SCHEMA
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 4
    # event_id is the global row index: dense, unique
    assert df.select("event_id").distinct().count() == 1000
    assert df.agg(F.max("event_id")).collect()[0][0] == 999


def test_batch_read_is_deterministic_across_reads(spark):
    _register(spark)

    def snap():
        return sorted(
            tuple(r)
            for r in spark.read.format("synthetic_events")
            .option("rows_per_partition", 100)
            .option("num_partitions", 2)
            .load()
            .collect()
        )

    assert snap() == snap()


def test_seed_changes_data(spark):
    _register(spark)

    def vals(seed):
        return [
            r["value"]
            for r in spark.read.format("synthetic_events")
            .option("rows_per_partition", 50)
            .option("num_partitions", 1)
            .option("seed", seed)
            .load()
            .collect()
        ]

    assert vals(0) != vals(1)


def test_stream_micro_batches_cover_prefix_exactly_once(spark, tmp_path):
    """Run the streaming reader for a few micro-batches: the sink must
    hold a dense exactly-once prefix [0, N) of the global row sequence,
    identical to the batch reader's rows."""
    _register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 200)
        .option("num_partitions", 2)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM synth_stream").collect()
    n = len(got)
    assert n >= 200  # at least one batch landed
    ids = sorted(r["event_id"] for r in got)
    assert ids == list(range(n))  # dense prefix, no dupes/gaps
    batch_rows = {
        r["event_id"]: tuple(r)
        for r in spark.read.format("synthetic_events")
        .option("rows_per_partition", n)
        .option("num_partitions", 1)
        .load()
        .collect()
    }
    assert all(tuple(r) == batch_rows[r["event_id"]] for r in got)
