#!/usr/bin/env python
"""Measure assign_shards' two-pass distributed prefix scan against the
naive per-source window on the workload that separates them: a corpus
dominated by ONE source. The naive `Window.partitionBy(source)` funnels
every row of a source through a single reducer, so its wall time is
bound by the largest source regardless of cores; the two-pass scan's
window is keyed on (range-partition, source), so parallelism stays at
the partition count. K× replicas of sf0.1 documents, all rewritten to a
single source.

Usage: python tools/measure_shard_assign.py [max_K]   (default 8)

Measured (sf0.1 base, local[32], r15): the naive window WINS while one
source fits one core comfortably, they cross at ~1.3M rows/source, and
the gap inverts hard from there — the naive side is a single-threaded
sort so it grows super-linearly while the two-pass stays ~linear:

    K=64    320k rows   two-pass  5.45s   naive   1.08s
    K=256   1.28M rows  two-pass  2.18s   naive   2.86s
    K=1024  5.12M rows  two-pass  3.81s   naive  14.25s
    K=4096  20.5M rows  two-pass 12.40s   naive  75.03s  (6.0x)

At 100 TB a source is billions of rows, far past the crossover; the
fixture-scale overhead (~1 s of collect + broadcast-join orchestration)
is the price of never having a per-source reducer.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET = 32_768


def one_source_docs(spark, k: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    n = base.selectExpr("max(doc_id)").collect()[0][0] + 1
    reps = spark.range(k).withColumnRenamed("id", "rep")
    return (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
            F.lit("src0").alias("source"),
            "n_chars",
        )
        .repartition(32)
        .persist()
    )


def naive(df):
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        "shard_id",
        F.expr(
            f"(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars) "
            f"DIV {TARGET}"
        ),
    )


def main() -> int:
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.layout import (
        assign_shards_handle,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark, tune

    spark = get_spark("shard-assign-measure")
    tune(spark)
    max_k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k = 1
    while k <= max_k:
        docs = one_source_docs(spark, k)
        n = docs.count()
        t0 = time.time()
        a, parted = assign_shards_handle(docs, TARGET, n_parts=32)
        a.write.format("noop").mode("overwrite").save()
        t_two = time.time() - t0
        t0 = time.time()
        naive(docs).write.format("noop").mode("overwrite").save()
        t_naive = time.time() - t0
        # equality spot-check at this K (cheap: both are deterministic)
        mism = (
            a.withColumnRenamed("shard_id", "s2")
            .join(naive(docs).select("doc_id", "shard_id"), "doc_id")
            .filter(F.col("s2") != F.col("shard_id"))
            .count()
        )
        parted.unpersist()
        print(
            f"K={k} rows={n:,} two-pass {t_two:6.2f}s  "
            f"naive-window {t_naive:6.2f}s  mismatches={mism}",
            flush=True,
        )
        docs.unpersist()
        k *= 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
