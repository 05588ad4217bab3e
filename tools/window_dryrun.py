#!/usr/bin/env python
"""Drive the EXACT driver window end-to-end: the first 50 entries of
__spark_entry__.queries() in registration order, one plain SparkSession
(default confs), each compared against its DuckDB oracle at sf0.01 —
precisely what the external harness does for CORRECTNESS_r{N}.json.

Run before round end, after ANY rotation or plan change: per-query
parity tests can't catch cross-query interference (conf pollution,
cache/temp-view collisions, scoped-cache leaks) in the window's real
execution order; this does. ~90 s for 50 queries.

Run: python tools/window_dryrun.py [N]   (default 50)
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-emu")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import duckdb

    import __spark_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    names = list(qs.keys())[:N]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    fails = []
    t_all = time.monotonic()
    for i, name in enumerate(names):
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, SF)
            got = sorted(
                tuple(map(repr, (row[c] for c in sorted(sdf.columns))))
                for row in sdf.collect()
            )
            sql = os_.get(name)
            if sql is None:
                status = f"rows-only ({len(got)})"
            else:
                res = con.execute(sql).fetchall()
                cols = [d[0] for d in con.description]
                order = sorted(range(len(cols)), key=lambda j: cols[j])
                exp = sorted(tuple(repr(r[j]) for j in order) for r in res)
                status = f"OK ({len(got)})" if got == exp else "HASH-MISMATCH"
                if got != exp:
                    fails.append(name)
        except Exception as e:  # noqa: BLE001 — report and continue, like the driver
            status = f"ERROR {type(e).__name__}: {e}"
            fails.append(name)
            traceback.print_exc()
        print(
            f"[{i + 1:2d}/{len(names)}] {name:28s} {status:22s}"
            f" {time.monotonic() - t0:6.1f}s",
            flush=True,
        )
    print(f"\nTOTAL {time.monotonic() - t_all:.0f}s  FAILURES: {fails or 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
