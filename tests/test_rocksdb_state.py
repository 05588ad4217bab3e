"""RocksDB state store provider — the off-heap state scale lever.

The default HDFSBackedStateStoreProvider keeps every key's state on the
executor HEAP; a 100 TB stream with hundreds of millions of live keys
(dedup signatures, session windows, minhash stores) blows past executor
memory. Spark ships RocksDBStateStoreProvider (rocksdbjni bundled in
pyspark's jars) which spills state to local SSD with a bounded block
cache — the standard production setting for large stateful topologies.

These tests prove the engine's stateful plans are PROVIDER-AGNOSTIC:
the same windowed aggregation and the same applyInPandasWithState
operator produce identical results under both providers, so switching
is one conf — exactly the claim SCALE.md makes.
"""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from spring_cloud_kafka_streams_dbz_etl_spark.sources.streams import stream_events
from spring_cloud_kafka_streams_dbz_etl_spark.streaming.stateful import (
    running_user_counters,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_conf(spark):
    prev = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(PROVIDER_CONF)
    else:
        spark.conf.set(PROVIDER_CONF, prev)


def _windowed_counts(spark, sf_smoke):
    name = f"rocks_{uuid.uuid4().hex[:8]}"
    ev = stream_events(spark, sf_smoke)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        return {tuple(r) for r in spark.table(name).collect()}
    finally:
        q.stop()


def test_windowed_agg_same_results_under_rocksdb(spark, sf_smoke):
    baseline = _windowed_counts(spark, sf_smoke)
    spark.conf.set(PROVIDER_CONF, ROCKSDB)
    try:
        rocks = _windowed_counts(spark, sf_smoke)
    finally:
        spark.conf.unset(PROVIDER_CONF)
    assert rocks == baseline
    assert len(rocks) > 0


def test_stateful_pandas_operator_under_rocksdb(spark, sf_smoke, rocksdb_conf):
    """applyInPandasWithState (the custom-operator path) on RocksDB."""
    name = f"rockstate_{uuid.uuid4().hex[:8]}"
    ev = stream_events(spark, sf_smoke)
    counters = running_user_counters(ev)
    q = (
        counters.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            spark.table(name)
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"))
        )
        exp = (
            spark.read.parquet(f"{sf_smoke}/events.parquet")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        assert {tuple(r) for r in got.collect()} == {tuple(r) for r in exp.collect()}
    finally:
        q.stop()


def test_stateful_counters_accumulate_across_micro_batches(spark, sf_smoke):
    """Cross-batch state accumulation (the path single-batch runs never hit).

    Regression pin: GroupState.get is a PROPERTY — `state.get()` called the
    returned tuple and crashed the stream on the first batch where
    `state.exists` was true. The sf fixtures arrive as ONE file -> one
    micro-batch, so every key's state was fresh and the bug sat latent
    until the first multi-batch operator (s_shard_assign) fired it. This
    feeds the same events in TWO appends and asserts the final per-key
    counters equal the whole-input batch aggregate.
    """
    import shutil

    name = f"multibatch_{uuid.uuid4().hex[:8]}"
    src = tempfile.mkdtemp(prefix=f"scksde_mb_src_{uuid.uuid4().hex[:6]}_")
    ev_all = spark.read.parquet(f"{sf_smoke}/events.parquet")
    half = ev_all.filter(F.col("event_id") % 2 == 0)
    rest = ev_all.filter(F.col("event_id") % 2 == 1)
    # one file per append -> one micro-batch each (atomic rename)
    half.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev_all.schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        running_user_counters(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        rest.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = (
            spark.table(name)
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("total_value_micros").alias("total_value_micros"),
            )
        )
        exp = ev_all.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)") * 1_000_000)
            .cast("long")
            .alias("total_value_micros"),
        )
        assert {tuple(r) for r in got.collect()} == {
            tuple(r) for r in exp.collect()
        }
    finally:
        q.stop()
        shutil.rmtree(src, ignore_errors=True)


def test_shard_assign_state_survives_query_restart(spark, sf_smoke):
    """s_shard_assign's docstring claims restart-reproducibility; this
    pins the stronger operational property: the running character total
    is RECOVERED FROM THE CHECKPOINT across a full stop/start — docs
    arriving after the restart continue the same shard sequence, equal
    to the batch cumulative-window plan over all arrivals."""
    import shutil

    from spring_cloud_kafka_streams_dbz_etl_spark.streaming.stateful import (
        running_shard_assign,
    )

    target = 4096  # small target so shards roll even at sf0.001
    src = tempfile.mkdtemp(prefix=f"scksde_rs_src_{uuid.uuid4().hex[:6]}_")
    ckpt = tempfile.mkdtemp(prefix=f"scksde_rs_ckpt_{uuid.uuid4().hex[:6]}_")
    out = tempfile.mkdtemp(prefix=f"scksde_rs_out_{uuid.uuid4().hex[:6]}_")
    d = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .withColumn("bucket", F.col("doc_id") % 3)
    )
    first = d.filter(F.col("bucket") == 0).drop("bucket")

    def start():
        # file sink, not memory: the memory sink is not fault-tolerant
        # and REFUSES checkpoint recovery — recovery is the point here
        stream = spark.readStream.schema(first.schema).parquet(src)
        return (
            running_shard_assign(stream, target)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    first.coalesce(1).write.mode("overwrite").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
        d.filter(F.col("bucket") == 1).drop("bucket").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    # restart from the same checkpoint; bucket 2 arrives only after
    q = start()
    try:
        q.processAllAvailable()
        d.filter(F.col("bucket") == 2).drop("bucket").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.doc_id: r.shard_id for r in spark.read.parquet(out).collect()
    }
    exp = {
        r.doc_id: r.shard_id
        for r in d.select(
            "doc_id",
            # integer floor-division, matching the kernel's `//` — a
            # double divide truncated via cast can misround once the
            # cumulative sum exceeds 2^53 (ADVICE r14)
            F.expr(
                f"(sum(n_chars) OVER (PARTITION BY source "
                f"ORDER BY doc_id % 3, doc_id "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                f"- n_chars) DIV {target}"
            ).alias("shard_id"),
        ).collect()
    }
    assert got == exp
    assert max(exp.values()) >= 1, "target too large: no shard ever rolled"
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
