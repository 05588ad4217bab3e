#!/usr/bin/env python
"""Noise-resistant query profile: run a query warm and report Spark job
count, total task time, and shuffle bytes from the UI REST API.

Usage: python tools/job_profile.py q_name [--sf DIR] [--reps 2]

Wall-clock on this sandbox swings 3x under neighbor steal; job/stage/task
counts and summed task time are deterministic-ish properties of the plan,
so before/after comparisons use THESE numbers (plus warm-pass medians from
tools/ab_bench.py for the headline).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries
    from spring_cloud_kafka_streams_dbz_etl_spark.session import _cpus, tune

    spark = (
        SparkSession.builder.master(f"local[{_cpus()}]")
        .appName("scksde-jobprofile")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "10000")
        .config("spark.ui.retainedStages", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.shuffle.partitions", str(_cpus()))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    tune(spark)
    spec = all_queries()[args.name]

    def run():
        spec.fn(spark, args.sf).write.format("noop").mode("overwrite").save()

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def jobs():
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs?status=succeeded") as r:
            return json.load(r)

    def stages():
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
            return json.load(r)

    run()  # warm
    for rep in range(args.reps):
        j0 = {j["jobId"] for j in jobs()}
        s0 = {(s["stageId"], s["attemptId"]) for s in stages()}
        t0 = time.perf_counter()
        run()
        wall = time.perf_counter() - t0
        js = [j for j in jobs() if j["jobId"] not in j0]
        ss = [s for s in stages() if (s["stageId"], s["attemptId"]) not in s0]
        task_ms = sum(s.get("executorRunTime", 0) for s in ss)
        shuffle_w = sum(s.get("shuffleWriteBytes", 0) for s in ss)
        tasks = sum(s.get("numCompleteTasks", 0) for s in ss)
        print(
            f"rep{rep}: wall={wall:.2f}s jobs={len(js)} stages={len(ss)} "
            f"tasks={tasks} taskTime={task_ms/1000:.1f}s shuffleWrite={shuffle_w}B",
            flush=True,
        )


if __name__ == "__main__":
    main()
