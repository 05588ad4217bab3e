"""Batch sinks: partitioned / bucketed parquet writers.

Scale rationale:
- ``write_partitioned``: hive-style directory partitioning on low-
  cardinality columns -> downstream queries get partition PRUNING (the
  scan skips directories). The 100 TB layout for anything filtered by
  date/type/cell.
- ``write_bucketed``: pre-shuffle by join/agg key into N buckets at write
  time -> later joins/aggs on that key skip their shuffle entirely
  (bucketed scan co-location). Worth it for dimension-fact layouts that
  join on the same key query after query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (metastore-backed; local spark-warehouse in
    tests). Joins between two tables bucketed on the same key with the
    same bucket count run shuffle-free."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def read_partition_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a partitioned layout (partition columns become columns;
    filters on them prune directories — assert via plans.inspect)."""
    return spark.read.parquet(path)


def idempotent_batch_write(df: DataFrame, batch_id: int, path: str) -> None:
    """Exactly-once foreachBatch sink: the epoch's rows land in a
    ``_batch_id=<N>`` partition via DYNAMIC partition overwrite, so a
    replayed epoch (checkpoint recovery re-runs the last uncommitted
    batch) REPLACES its own partition instead of appending duplicates.
    This is the upgrade path from the reference's at_least_once default
    (CLAUDE.md:157-159) to effective exactly-once on an object-store sink:
    idempotent writes + the checkpoint WAL's deterministic batch ids.

    Dynamic overwrite only rewrites partitions PRESENT in the new data, so
    a replay that produces zero rows (possible when the replayed transform
    is non-deterministic — e.g. the enrichment dimension changed between
    attempts) would otherwise strand the first attempt's rows. The epoch's
    partition directory is therefore deleted up front (Hadoop FS API, so
    the same code path works on HDFS/S3A/local), making the guarantee hold
    for non-deterministic replays too.

    Scale: the pre-delete + overwrite touch only the one partition being
    (re)written — other epochs' directories are never listed or rewritten.

    Read-visibility window (ADVICE r02): the pre-delete is NOT atomic with
    the rewrite — a concurrent reader between delete and write-commit sees
    the epoch's partition missing, and a crash in that window leaves it
    empty until checkpoint replay re-runs the batch (which the WAL
    guarantees, so the exactly-once CONTENT contract still holds). Readers
    needing the old rows until the new ones land should read a snapshot
    isolation layer (e.g. a table format) or tolerate the gap; a
    temp-prefix + rename commit is the upgrade if that matters.
    """
    spark = df.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    part_dir = jvm.org.apache.hadoop.fs.Path(f"{path}/_batch_id={batch_id}")
    part_dir.getFileSystem(hconf).delete(part_dir, True)
    (
        df.withColumn("_batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(path)
    )


def read_idempotent_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read an idempotent sink's logical content (partition key dropped)."""
    return spark.read.parquet(path).drop("_batch_id")
