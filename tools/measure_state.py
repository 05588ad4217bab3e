#!/usr/bin/env python
"""Measure the per-micro-batch fixed cost of state-store instances.

The basis for session.stream_tune's sizing rule: each state-store
instance pays open/commit/snapshot overhead EVERY trigger regardless of
how few keys it holds, and stateful exchanges are exempt from AQE
coalescing — so oversized instance counts tax every micro-batch of the
stream's life. This harness holds the state constant (one windowed agg
over the same events slice, drained in M file-fed micro-batches) and
sweeps spark.sql.shuffle.partitions at stream start, timing the drain.

Run: python tools/measure_state.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spring_cloud_kafka_streams_dbz_etl_spark.catalog import table  # noqa: E402
from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark, tune  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
BATCHES = 8
REPEATS = 3


def drain(spark, parts: int) -> float:
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    name = f"ms_{uuid.uuid4().hex[:8]}"
    src = tempfile.mkdtemp(prefix="ms_src")
    ckpt = tempfile.mkdtemp(prefix="ms_ckpt")
    ev = (
        table(spark, SF, "events")
        .select("event_id", "ts", "event_type")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    # M files -> maxFilesPerTrigger=1 gives a deterministic M-batch drain
    ev.repartition(BATCHES).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = stream.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    t0 = time.time()
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    dt = time.time() - t0
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return dt


def changefeed_cost(spark, keys: int = 1_000_000,
                    change_sizes: tuple[int, ...] = (1_000, 10_000, 100_000),
                    repeats: int = 3) -> None:
    """Adversarial-scale read-cost experiment (VERDICT r13 ask #5):
    build ONE checkpoint holding ``keys`` distinct state keys, append
    one micro-batch per entry of ``change_sizes`` (each touching that
    many keys), then time

      - the full `statestore` read (proportional to STORE size), and
      - `readChangeFeed` scoped to each change batch (claimed
        proportional to the CHANGES in the batch, never store size).

    If the claim holds, per-batch feed time tracks the batch's change
    count and stays far under the full-store read while the store is
    constant at ``keys``. Structure (partition-parallel, zero Exchange)
    is pinned separately in
    test_state_sources_partition_parallel_at_1e5_keys.

    ``store_sweep`` is the sharper complement: hold the change batch at
    a constant 10k keys while the STORE grows 4x per step — full-read
    time must grow with the store, scoped-feed time must not."""
    from spring_cloud_kafka_streams_dbz_etl_spark.session import stream_tune

    stream_tune(spark, keys)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    src = tempfile.mkdtemp(prefix="cf_src")
    ckpt = tempfile.mkdtemp(prefix="cf_ckpt")
    base = spark.range(keys).selectExpr("id AS k")
    base.coalesce(1).write.mode("overwrite").parquet(src)
    q = (
        spark.readStream.schema(base.schema)
        .parquet(src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.outputMode("update")
        .foreachBatch(lambda b, _id: b.write.format("noop").mode("overwrite").save())
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()  # batch 0: all keys enter state
        for n in change_sizes:   # batch i: touch n keys (coalesce -> 1 file -> 1 batch)
            spark.range(n).selectExpr("id AS k").coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()

    def timed(df) -> tuple[float, int]:
        best, rows = float("inf"), -1
        for _ in range(repeats):
            t0 = time.time()
            rows = df.count()
            best = min(best, time.time() - t0)
        return best, rows

    print(f"\n# change-feed cost vs store size: {keys:,}-key store, "
          f"{parts} instances, best of {repeats}")
    full_t, full_n = timed(spark.read.format("statestore").load(ckpt))
    print(f"full statestore read : {full_n:9,} rows  {full_t:6.2f} s", flush=True)
    for i, n in enumerate(change_sizes, start=1):
        feed = (
            spark.read.format("statestore")
            .option("readChangeFeed", "true")
            .option("changeStartBatchId", str(i))
            .option("changeEndBatchId", str(i))
            .load(ckpt)
        )
        t, rows = timed(feed)
        print(f"changefeed batch {i} ({n:7,} changes): {rows:9,} rows  "
              f"{t:6.2f} s  ({t / full_t:5.2f}x full read)", flush=True)
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def store_sweep(spark, stores: tuple[int, ...] = (250_000, 1_000_000, 4_000_000),
                touched: int = 10_000, repeats: int = 3) -> None:
    """Constant 10k-change batch, growing store: the changefeed read
    scoped to the change batch must stay flat while the full statestore
    read grows with the store."""
    from spring_cloud_kafka_streams_dbz_etl_spark.session import stream_tune

    print(f"\n# store-size sweep: constant {touched:,}-change batch, "
          f"growing store; best of {repeats}")
    for keys in stores:
        stream_tune(spark, keys)
        src = tempfile.mkdtemp(prefix="sw_src")
        ckpt = tempfile.mkdtemp(prefix="sw_ckpt")
        base = spark.range(keys).selectExpr("id AS k")
        base.coalesce(1).write.mode("overwrite").parquet(src)
        q = (
            spark.readStream.schema(base.schema)
            .parquet(src)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda b, _id: b.write.format("noop").mode("overwrite").save()
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            spark.range(touched).selectExpr("id AS k").coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()

        def best_of(df) -> float:
            return min(
                (lambda t0: (df.count(), time.time() - t0))(time.time())[1]
                for _ in range(repeats)
            )

        full_t = best_of(spark.read.format("statestore").load(ckpt))
        feed_t = best_of(
            spark.read.format("statestore")
            .option("readChangeFeed", "true")
            .option("changeStartBatchId", "1")
            .option("changeEndBatchId", "1")
            .load(ckpt)
        )
        print(f"store={keys:9,}: full read {full_t:6.2f} s   "
              f"feed(batch 1) {feed_t:6.2f} s", flush=True)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    spark = get_spark("measure-state", cpus=32)
    tune(spark)
    drain(spark, 8)  # warmup: JIT + footer caches
    print(f"# {BATCHES}-batch drain of a constant ~3.6k-key windowed agg, "
          f"median of {REPEATS}; state instances = shuffle partitions at start")
    for parts in (4, 8, 16, 32, 64, 128):
        ts = sorted(drain(spark, parts) for _ in range(REPEATS))
        med = ts[len(ts) // 2]
        print(f"partitions={parts:4d}: {med:6.2f} s  "
              f"({med / BATCHES:5.3f} s/batch)  samples={['%.2f' % t for t in ts]}",
              flush=True)
    changefeed_cost(spark)
    store_sweep(spark)
    spark.stop()


if __name__ == "__main__":
    main()
