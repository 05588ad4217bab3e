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
    spark.stop()


if __name__ == "__main__":
    main()
