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


# Target distinct state keys per state-store instance. Each instance holds
# its keys in executor memory (~100 B/key for counter/window state), so 25k
# keys is a few MB — far below any executor budget; the binding cost at the
# other end is the PER-INSTANCE fixed overhead every micro-batch pays
# (open/commit/snapshot of the instance's delta files), which AQE cannot
# coalesce away because stateful exchanges are exempt from runtime
# re-planning. Measured on this fixture: s_chained_agg 4.10 s -> 2.15 s
# wall (ISOLATED repeat medians — fresh idle session per measurement;
# 32 -> 4 instances per store, local[32], sf0.1). The same change read
# 7.43 -> 2.17 s in the r13 in-session bench's INTERLEAVED rows
# (tools/measure_watchlist.py) — same win, noisier context; the
# isolated medians are the canonical number.
STATE_KEYS_PER_PARTITION = 25_000


def stream_tune(spark: SparkSession, expected_state_keys: int) -> SparkSession:
    """:func:`tune` plus state-store-instance sizing for a STATEFUL stream.

    Unlike batch shuffles, the partition count of a stateful streaming
    exchange is (a) exempt from AQE coalescing and (b) frozen into the
    checkpoint at first start — it cannot be changed without discarding
    state. So it must be sized deliberately, to the STATE, not to the core
    count: ``ceil(expected_state_keys / 25k)`` instances, floored at 4 (so
    tiny fixtures still exercise parallel state) and capped at cluster
    parallelism (a huge key space gets every core; beyond that more
    instances only add per-batch fixed cost).

    ``expected_state_keys`` is the caller's key-space estimate. For
    windowed aggregations it is types x windows-in-retention — a function
    of TIME SPAN, not data volume, so a static estimate stays honest at
    any scale. For user/session-keyed state it is the entity count; on a
    real deployment pass the production estimate. Volume-proportional
    state (stream-stream join buffers, unbounded dedup key sets) should
    keep :func:`tune`'s parallelism-sized default instead — there the
    state genuinely fills core-count instances.
    """
    import math

    tune(spark)
    try:
        par = spark.sparkContext.defaultParallelism
    except Exception:  # pragma: no cover - connect-only sessions
        par = _cpus()
    parts = min(max(4, math.ceil(expected_state_keys / STATE_KEYS_PER_PARTITION)), max(par, 4))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
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
