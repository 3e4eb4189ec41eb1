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


def test_jsonl_manifest_sink_two_phase_commit(spark, tmp_path):
    """Custom Python DataSource WRITER (the sink half of the BYO
    connector surface): every task writes one JSONL shard, the driver
    commit publishes MANIFEST.json atomically, and the manifest totals
    must equal the written data exactly. Readers follow the manifest,
    so uncommitted shards are invisible by contract."""
    import json
    import os

    from data_engineer_task_spark.sources.pysink import (
        JsonlManifestSink,
        MANIFEST_NAME,
        ShardCommit,
        _JsonlShardWriter,
        read_manifest,
    )

    spark.dataSource.register(JsonlManifestSink)
    out = str(tmp_path / "sink")
    df = spark.range(0, 1000).selectExpr("id", "id * 2 AS dbl").repartition(4)
    df.write.format("jsonl_manifest").mode("append").option("path", out).save()

    man = read_manifest(out)
    assert man["n_rows"] == 1000
    assert man["n_shards"] == 4
    # every manifest shard exists and line counts add up
    total_lines = 0
    for s in man["shards"]:
        p = os.path.join(out, s["file"])
        with open(p) as f:
            lines = f.readlines()
        assert len(lines) == s["n_rows"]
        total_lines += len(lines)
    assert total_lines == 1000
    # round-trip: the manifest-listed shards reproduce the data
    back = spark.read.json([os.path.join(out, s["file"]) for s in man["shards"]])
    assert back.count() == 1000
    assert back.selectExpr("sum(dbl)").collect()[0][0] == sum(2 * i for i in range(1000))

    # abort sweeps orphan shards and never publishes a manifest
    out2 = str(tmp_path / "aborted")
    w = _JsonlShardWriter(out2, overwrite=False)
    msgs = [ShardCommit(filename="part-x.jsonl", n_rows=1, n_bytes=2)]
    os.makedirs(out2, exist_ok=True)
    open(os.path.join(out2, "part-x.jsonl"), "w").write("{}\n")
    w.abort(msgs)
    assert not os.path.exists(os.path.join(out2, "part-x.jsonl"))
    assert not os.path.exists(os.path.join(out2, MANIFEST_NAME))


def test_jsonl_manifest_sink_append_merges_manifest(spark, tmp_path):
    """ADVICE r2: a SECOND .mode('append') write to the same path must
    publish a manifest that still names the first job's shards —
    manifest-following readers would otherwise silently lose the
    earlier job's rows. Overwrite mode must supersede instead."""
    import os

    from data_engineer_task_spark.sources.pysink import (
        JsonlManifestSink,
        read_manifest,
    )

    spark.dataSource.register(JsonlManifestSink)
    out = str(tmp_path / "sink_append")
    spark.range(0, 100).repartition(2).write.format("jsonl_manifest").mode(
        "append"
    ).option("path", out).save()
    first = read_manifest(out)
    spark.range(100, 250).repartition(3).write.format("jsonl_manifest").mode(
        "append"
    ).option("path", out).save()

    man = read_manifest(out)
    assert man["n_shards"] == 5
    assert man["n_rows"] == 250
    assert {s["file"] for s in first["shards"]} <= {s["file"] for s in man["shards"]}
    back = spark.read.json([os.path.join(out, s["file"]) for s in man["shards"]])
    assert sorted(r["id"] for r in back.collect()) == list(range(250))

    # overwrite supersedes: only the new job's shards remain listed
    spark.range(0, 10).repartition(1).write.format("jsonl_manifest").mode(
        "overwrite"
    ).option("path", out).save()
    man2 = read_manifest(out)
    assert man2["n_shards"] == 1 and man2["n_rows"] == 10
