"""Python DataSource connector (sources/pysource.py) — offset contract.

The claim worth testing is RECOVERY: Spark checkpoints the connector's
per-partition offsets, so a stopped query must resume exactly where it
left off (no loss, no duplicates), and records appended between runs
must arrive in the second run — the contract a Kafka consumer group
provides, here spoken by our own reader. The sink side pins dense
broker-append offsets across epochs and staging cleanup.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from spring_cloud_kafka_streams_dbz_etl_spark.sources.kafka_replay import (
    record_kafka_transcript,
    transcript_end_offsets,
)
from spring_cloud_kafka_streams_dbz_etl_spark.sources.pysource import (
    register_kafka_transcript_source,
)


def _tmp(kind: str) -> str:
    return tempfile.mkdtemp(prefix=f"scksde_pysrc_{kind}_{uuid.uuid4().hex[:6]}_")


def test_stream_reader_resumes_from_checkpoint_without_dup_or_loss(spark, sf_smoke):
    topic, out, ckpt = _tmp("topic"), _tmp("out"), _tmp("ckpt")
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    record_kafka_transcript(first, topic, n_partitions=4)

    register_kafka_transcript_source(spark)

    def start():
        return (
            spark.readStream.format("kafka_transcript")
            .option("path", topic)
            .option("startingOffsets", "earliest")
            .load()
            .selectExpr("partition", "offset", "key")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_first = spark.read.parquet(out).count()
    assert n_first == first.count()

    # records appended while the consumer is DOWN (broker-append: offsets
    # continue from the current per-partition ends)...
    record_kafka_transcript(second, topic, n_partitions=4, append=True)
    q = start()  # ...must arrive on restart, once each
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    assert got.count() == ev.count(), "loss or duplication across restart"
    # (partition, offset) pairs are unique and dense per partition
    assert got.select("partition", "offset").distinct().count() == ev.count()
    ends = transcript_end_offsets(spark, topic)
    assert sum(ends.values()) == ev.count()


def test_stream_writer_appends_dense_offsets_across_epochs(spark, sf_smoke):
    topic, src, ckpt = _tmp("wtopic"), _tmp("wsrc"), _tmp("wckpt")
    ev = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select(
            F.col("event_id").cast("string").cast("binary").alias("key"),
            F.col("event_type").cast("binary").alias("value"),
            (F.col("event_id") % 3).cast("int").alias("partition"),
        )
    )
    a = ev.filter(F.col("partition") != 2)
    b = ev.filter(F.col("partition") == 2)
    a.coalesce(1).write.mode("overwrite").parquet(src)

    register_kafka_transcript_source(spark)
    q = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .writeStream.format("kafka_transcript")
        .option("path", topic)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        b.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()  # second epoch appends AFTER the first's ends
    finally:
        q.stop()

    ends = transcript_end_offsets(spark, topic)
    assert sum(ends.values()) == ev.count()
    rows = spark.read.parquet(topic)
    assert rows.select("partition", "offset").distinct().count() == ev.count()
    # per partition: offsets are exactly 0..end-1 (dense broker append)
    per = {
        int(r["partition"]): (int(r["mn"]), int(r["mx"]), int(r["n"]))
        for r in rows.groupBy("partition")
        .agg(
            F.min("offset").alias("mn"),
            F.max("offset").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for p, (mn, mx, n) in per.items():
        assert mn == 0 and mx == n - 1, (p, mn, mx, n)
    # staging fully cleaned after commits
    staging = topic.rstrip("/") + "__staging"
    assert not os.path.exists(staging) or not os.listdir(staging)


def test_stream_reader_honors_max_offsets_per_trigger(spark, sf_smoke):
    """The max.poll.records analogue: with maxOffsetsPerTrigger=N the
    reader rate-limits steady-state micro-batches (the first planning
    call of a run is deliberately uncapped — the no-arg latestOffset API
    cannot see a restarted query's committed start, and capping from
    earliest could plan an end BELOW it; full ends are always
    monotone-safe) and still delivers every record exactly once."""
    topic, out, ckpt = _tmp("thr_topic"), _tmp("thr_out"), _tmp("thr_ckpt")
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    record_kafka_transcript(half_a, topic, n_partitions=4)

    register_kafka_transcript_source(spark)
    q = (
        spark.readStream.format("kafka_transcript")
        .option("path", topic)
        .option("maxOffsetsPerTrigger", 100)
        .load()
        .selectExpr("partition", "offset")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1: uncapped drain of half_a
        # steady state: new backlog arrives -> rate-limited batches
        record_kafka_transcript(half_b, topic, n_partitions=4, append=True)
        q.processAllAvailable()
        steady = [
            p["numInputRows"]
            for p in q.recentProgress
            if p["numInputRows"] > 0 and p["batchId"] > 0
        ]
    finally:
        q.stop()
    got = spark.read.parquet(out)
    n = ev.count()
    assert got.count() == n
    assert got.distinct().count() == n  # exactly once
    n_b = half_b.count()
    # per-batch max is cap + (partitions-1) ceil slack = 103, so the
    # minimum batch count uses THAT bound (not cap alone)
    assert len(steady) >= -(-n_b // 103), steady  # multiple throttled batches
    assert all(r <= 103 for r in steady), steady


def test_sink_commit_replay_assigns_identical_offsets(tmp_path):
    """Crash-before-checkpoint replay: committing the SAME epoch twice
    must re-assign identical offsets (the epoch file overwrites itself)
    — the base calculation excludes the epoch's own previous attempt."""
    import pyarrow.parquet as pq

    from spring_cloud_kafka_streams_dbz_etl_spark.sources.pysource import (
        KafkaTranscriptStreamWriter,
        _StagedCommit,
        _transcript_ends,
    )

    topic = str(tmp_path / "topic")
    writer = KafkaTranscriptStreamWriter({"path": topic})

    def stage(rows):
        import pyarrow as pa

        p = str(tmp_path / f"stage_{uuid.uuid4().hex}.parquet")
        pq.write_table(
            pa.table(
                {
                    "key": pa.array([k for k, _, _ in rows], pa.binary()),
                    "value": pa.array([v for _, v, _ in rows], pa.binary()),
                    "partition": pa.array([p_ for _, _, p_ in rows], pa.int32()),
                }
            ),
            p,
        )
        return _StagedCommit(p)

    epoch0 = [(b"k1", b"v1", 0), (b"k2", b"v2", 0), (b"k3", b"v3", 1)]
    epoch1 = [(b"k4", b"v4", 0), (b"k5", b"v5", 1)]
    writer.commit([stage(epoch0)], batchId=0)
    writer.commit([stage(epoch1)], batchId=1)
    first = _transcript_ends(topic)
    assert first == {0: 3, 1: 2}

    # replay epoch 1 (as after a crash before the checkpoint commit)
    writer.commit([stage(epoch1)], batchId=1)
    assert _transcript_ends(topic) == first, "replay shifted offsets"
    # offsets stay dense: every (partition, offset) pair unique, 0-based
    tbl = pq.read_table(topic + "/epoch_000001.parquet")
    offs = sorted(zip(tbl["partition"].to_pylist(), tbl["offset"].to_pylist()))
    assert offs == [(0, 2), (1, 1)], offs


def test_writer_staging_scoped_per_query_checkpoint():
    """ADVICE r05: commit's orphan sweep must be scoped per query — a
    second query committing against the same transcript path must NOT
    delete the first query's staged (not-yet-committed) epoch files."""
    from collections import namedtuple

    from spring_cloud_kafka_streams_dbz_etl_spark.sources.pysource import (
        KafkaTranscriptStreamWriter,
    )

    Row = namedtuple("Row", ["key", "value", "partition"])
    path = _tmp("scope_topic")
    w_a = KafkaTranscriptStreamWriter(
        {"path": path, "checkpointLocation": _tmp("ck_a")}
    )
    w_b = KafkaTranscriptStreamWriter(
        {"path": path, "checkpointLocation": _tmp("ck_b")}
    )
    assert w_a._staging != w_b._staging

    # A stages an epoch (executor side) but has not committed yet
    staged_a = w_a.write(iter([Row(b"k1", b"v1", 0)]))
    assert os.path.exists(staged_a.staged_path)

    # B stages and commits its own epoch — must sweep only B's scope
    staged_b = w_b.write(iter([Row(b"k2", b"v2", 0)]))
    w_b.commit([staged_b], 0)
    assert os.path.exists(staged_a.staged_path), "B's sweep deleted A's stage"

    # A commits afterwards; both scopes and the root end clean
    w_a.commit([staged_a], 0)
    root = path.rstrip("/") + "__staging"
    assert not os.path.exists(root) or not os.listdir(root)
