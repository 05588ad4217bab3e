#!/usr/bin/env python
"""Dump .explain("formatted") for bench (or named) queries to plans/r18/.

Usage:
  python tools/dump_plans.py before            # all bench queries
  python tools/dump_plans.py before --only a,b
  python tools/dump_plans.py after  --only a,b

Writes plans/r18/<query>_<tag>.txt. Building a query's DataFrame runs any
driver-side training/collect work the builder does (streaming builders
execute their micro-batches), so a full sweep costs roughly one bench pass.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", "r18")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=["before", "after"])
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--all-bench", action="store_true")
    args = ap.parse_args()

    from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries
    from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark

    specs = all_queries()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
    else:
        names = sorted(n for n, s in specs.items() if s.bench)
    os.makedirs(OUT_DIR, exist_ok=True)

    spark = get_spark("scksde-plandump")
    for name in names:
        if name not in specs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        path = os.path.join(OUT_DIR, f"{name}_{args.tag}.txt")
        try:
            spark.catalog.clearCache()
            df = specs[name].fn(spark, SF_DIR)
            qe = df._jdf.queryExecution()
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = qe.explainString(mode)
        except Exception as exc:  # noqa: BLE001 - record the failure in place
            plan = f"ERROR building/explaining {name}: {exc!r}\n"
        with open(path, "w") as f:
            f.write(f"-- {name} @ {SF_DIR} ({args.tag})\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
