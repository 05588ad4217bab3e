#!/usr/bin/env python
"""Warm-session repeat-median timing for named queries (A/B harness).

Usage:
  python tools/ab_bench.py q_a,q_b [--reps 5] [--sf /root/testdata/sf0.1]

Runs one warmup pass of every named query (JVM/codegen/Arrow warm), then
`reps` ALTERNATING passes (q_a, q_b, q_a, q_b, ...) so a load burst lands
on both sides; prints per-query min/median/max. The bursty-steal sandbox
makes single-shot timings lie (see OPTIMIZATION_r17.md "measurement
protocol") — medians of alternating warm passes are the unit of evidence
for before/after claims this round.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated query names")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries
    from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark

    specs = all_queries()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    for n in names:
        if n not in specs:
            raise SystemExit(f"unknown query {n}")

    spark = get_spark("scksde-ab")
    sc = spark.sparkContext

    def run(name: str) -> float:
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        specs[name].fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
        return round(dt, 3)

    # warmup pass (not recorded)
    for n in names:
        run(n)
    raw: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.reps):
        for n in names:
            raw[n].append(run(n))
    out = {}
    for n in names:
        ts = sorted(raw[n])
        out[n] = {
            "median": ts[len(ts) // 2],
            "min": ts[0],
            "max": ts[-1],
            "raw": raw[n],
        }
        print(f"{n}: median={out[n]['median']} min={ts[0]} max={ts[-1]} raw={raw[n]}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
