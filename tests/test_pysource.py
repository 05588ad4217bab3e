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
    assert len(steady) >= -(-n_b // 100), steady  # multiple throttled batches
    assert all(r <= 100 + 4 for r in steady), steady  # ceil slack per partition
