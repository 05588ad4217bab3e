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
