#!/usr/bin/env python
"""Measure the bucketed co-located join against the shuffle join it
replaces (SCALE.md evidence for q_bucketed_join's claim).

Inflates sf0.1 orders/lineitem by DUP x (key-shifted copies, so the join
key space scales with the data), then times the same per-order
join+aggregate three ways:

  shuffle   — plain sort-merge join over parquet (broadcast disabled:
              the two-fact 100 TB regime), both sides exchange
  bucketed  — both facts pre-written as bucketed tables, zero exchange
  write     — the one-time bucketed-write cost being amortized

Run: python tools/measure_bucketed_join.py [DUP] (default 8)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spring_cloud_kafka_streams_dbz_etl_spark.functions.scalars import dec_sum  # noqa: E402
from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DUP = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_BUCKETS = 32


def inflate(df, key_col: str, shift: int):
    copies = [
        df.withColumn(key_col, F.col(key_col) + F.lit(i * shift)) for i in range(DUP)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def agg_join(o, li):
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dec_sum(F.col("l_quantity"), "sum_qty"),
            dec_sum(F.col("l_extendedprice"), "sum_price"),
        )
    )


def timed(label: str, df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"{label:>28s}: {dt:7.2f} s")
    return dt


def main() -> None:
    spark = get_spark("bucketed-join-measure")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    key_shift = 100_000_000
    orders = inflate(
        spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        ),
        "o_orderkey",
        key_shift,
    )
    li = inflate(
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        ),
        "l_orderkey",
        key_shift,
    )
    n_o, n_l = orders.count(), li.count()
    print(f"rows: orders={n_o:,} lineitem={n_l:,} (DUP={DUP})")

    # Materialize inflated inputs as plain parquet so both strategies read
    # comparable scans (not the union lineage).
    base = tempfile.mkdtemp(prefix="bktmeasure_")
    orders.write.mode("overwrite").parquet(f"{base}/orders")
    li.write.mode("overwrite").parquet(f"{base}/lineitem")
    o_plain = spark.read.parquet(f"{base}/orders")
    l_plain = spark.read.parquet(f"{base}/lineitem")

    shuffle_ts = [timed("shuffle SMJ (run %d)" % i, agg_join(o_plain, l_plain)) for i in (1, 2, 3)]

    t0 = time.perf_counter()
    for tbl, key, df in (
        ("mb_orders", "o_orderkey", o_plain),
        ("mb_lineitem", "l_orderkey", l_plain),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", os.path.join(base, tbl))
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    write_t = time.perf_counter() - t0
    print(f"{'bucketed write (once)':>28s}: {write_t:7.2f} s")

    o_b = spark.table("mb_orders")
    l_b = spark.table("mb_lineitem")
    bucketed_ts = [timed("bucketed SMJ (run %d)" % i, agg_join(o_b, l_b)) for i in (1, 2, 3)]

    med = lambda xs: sorted(xs)[1]  # noqa: E731
    print(
        f"\nmedian shuffle={med(shuffle_ts):.2f}s bucketed={med(bucketed_ts):.2f}s "
        f"speedup={med(shuffle_ts) / med(bucketed_ts):.2f}x; "
        f"write amortizes after {write_t / max(1e-9, med(shuffle_ts) - med(bucketed_ts)):.1f} queries"
    )


if __name__ == "__main__":
    main()
