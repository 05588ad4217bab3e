#!/usr/bin/env python
"""Measure the Python DataSource connector's demo cost: drain the same
recorded transcript through (a) the JVM parquet file-stream stand-in and
(b) the Python connector (kafka_transcript), same downstream count.

The connector's VALUE is the offset contract (per-partition positions,
range replay, throttling); its COST is the Python row boundary. This
prints both so SCALE.md's "demo cost" claim is a measured number, not a
guess.

Usage: python tools/measure_pysource.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark  # noqa: E402
from spring_cloud_kafka_streams_dbz_etl_spark.sources.kafka_replay import (  # noqa: E402
    KAFKA_SOURCE_SCHEMA,
    record_kafka_transcript,
)
from spring_cloud_kafka_streams_dbz_etl_spark.sources.pysource import (  # noqa: E402
    register_kafka_transcript_source,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def drain(spark, src_df, label: str, n_expected: int) -> None:
    out = tempfile.mkdtemp(prefix=f"pysrc_bench_{uuid.uuid4().hex[:6]}_")
    ckpt = tempfile.mkdtemp(prefix=f"pysrc_bench_ck_{uuid.uuid4().hex[:6]}_")
    t0 = time.time()
    q = (
        src_df.selectExpr("partition", "offset")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    dt = time.time() - t0
    n = spark.read.parquet(out).count()
    assert n == n_expected, (label, n, n_expected)
    print(f"{label:>24}: {dt:6.2f}s  ({n / dt:,.0f} rows/s)")


def main() -> None:
    spark = get_spark("measure-pysource")
    topic = tempfile.mkdtemp(prefix=f"pysrc_bench_topic_{uuid.uuid4().hex[:6]}_")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    record_kafka_transcript(ev, topic, n_partitions=4)
    print(f"transcript: {n} records, 4 partitions")

    jvm = spark.readStream.schema(KAFKA_SOURCE_SCHEMA).parquet(topic)
    drain(spark, jvm, "JVM file stand-in", n)

    register_kafka_transcript_source(spark)
    py = (
        spark.readStream.format("kafka_transcript")
        .option("path", topic)
        .load()
    )
    drain(spark, py, "Python connector", n)


if __name__ == "__main__":
    main()
