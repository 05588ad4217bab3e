"""SparkSession factory + runtime tuning.

Local test/bench sessions come from :func:`get_spark`. Driver-owned sessions
(the correctness harness passes its own) are normalized per-query via
:func:`tune` — every conf set there is runtime-settable, so it is safe to
apply to any live session.

Scale notes (100 TB design targets, tested on local[32]):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic broadcast-join demotion/promotion replace hand-tuned partition
  counts when the same code runs on a 1000-executor cluster.
- ``spark.sql.shuffle.partitions`` defaults to cluster parallelism here;
  on a real cluster AQE coalescing makes the initial number a ceiling.
- Session timezone pinned to UTC so timestamp semantics are stable across
  engines (parquet naive timestamps == UTC wall clock).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 4


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to any session (ours or the driver's)."""
    conf = spark.conf
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # The driver testdata stores `events.ts` as parquet TIMESTAMP(NANOS);
    # Spark 4.1 reads it natively as TIMESTAMP_NTZ truncated to micros —
    # the same truncation DuckDB applies — so no legacy conf is needed.
    # (catalog.table keeps a long-nanos fallback for engines that still
    # surface the column as bigint.)
    try:
        par = spark.sparkContext.defaultParallelism
    except Exception:  # pragma: no cover - connect-only sessions
        par = _cpus()
    conf.set("spark.sql.shuffle.partitions", str(max(par, 4)))
    return spark


def get_spark(app_name: str = "scksde-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a local session sized for this machine."""
    n = cpus or _cpus()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
