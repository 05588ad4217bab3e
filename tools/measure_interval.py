#!/usr/bin/env python
"""Measure the grid-cell interval overlap join against the naive same-key
self-join it replaces (SCALE.md evidence for q_interval_join's claim).

Synthetic workload with a HOT KEY — the shape that kills the naive join:
N intervals over a 360-day horizon, spans <= 21 days, HOT_FRAC of all
rows on one key (a boilerplate supplier / a mega-tenant), the rest spread
over many cold keys. Times, at growing N:

  naive — self-join on the key alone, overlap predicate in the join
          filter: per-key cross product, the hot key's partition does
          |hot|^2 comparisons in one task
  grid  — interval_overlap_pairs: explode to 7-day cells, equi-join on
          (key, cell), ownership-cell dedup; per-task work bounded by
          per-(key, cell) co-occurrence

Pair counts are asserted identical. Run:
    python tools/measure_interval.py [N ...]  (default 100000 200000 400000)

Finding (r6, idle machine, local[32], 7-day cells, 10% hot key):

    N=200k (hot 20k,  0.4e9 hot cmp)   naive  1.8 s   grid 1.6 s
    N=400k (hot 40k,  1.6e9 hot cmp)   naive  2.2 s   grid 2.0 s
    N=800k (hot 80k,  6.5e9 hot cmp)   naive 75.7 s   grid 3.3 s

Identical pair counts at every size (12.9M / 52.5M / 210.4M). The naive
join's hot-key partition is one task doing |hot|^2 comparisons — fine
until the cross product stops fitting the task's CPU slice, then the
wall time goes quadratic (2.2 s -> 75.7 s for a 2x input). The grid
join's per-task bound is per-(key, cell) co-occupancy, so it scales with
total OUTPUT instead: 3.3 s at 210M pairs, a 23x gap that widens
quadratically with the hot key. On a cluster the naive form eventually
straggles or OOMs the hot task; the grid form just adds reducers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spring_cloud_kafka_streams_dbz_etl_spark.operators.temporal import (  # noqa: E402
    interval_overlap_pairs,
)
from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark  # noqa: E402

SIZES = [int(a) for a in sys.argv[1:]] or [100_000, 200_000, 400_000]
HOT_FRAC = 10  # 1/HOT_FRAC of rows land on the hot key
N_COLD_KEYS = 2_000
CELL_DAYS = 7
HORIZON_DAYS = 360
MAX_SPAN = 21


def intervals(spark, n: int):
    """Deterministic synthetic intervals: md5-mixed day/span/key."""
    r = spark.range(n)
    mix = lambda salt: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("long")
    key = F.when(mix(":hot") % HOT_FRAC == 0, F.lit(0)).otherwise(
        mix(":key") % N_COLD_KEYS + 1
    )
    start = F.date_add(F.lit("1992-01-01").cast("date"), (mix(":day") % HORIZON_DAYS).cast("int"))
    return r.select(
        key.alias("k"),
        F.col("id"),
        start.alias("s"),
        F.date_add(start, (mix(":span") % MAX_SPAN + 1).cast("int")).alias("e"),
    )


def run(label: str, df) -> tuple[float, int]:
    t0 = time.monotonic()
    n = df.count()
    dt = time.monotonic() - t0
    print(f"  {label:6s} {dt:7.2f} s   {n:,} pairs")
    return dt, n


def main() -> None:
    spark = get_spark()
    for n in SIZES:
        iv = intervals(spark, n).persist()
        iv.count()
        hot = iv.filter(F.col("k") == 0).count()
        print(f"N={n:,} (hot key: {hot:,} rows -> naive does {hot*hot:,} hot comparisons)")
        a = iv.select(F.col("k"), F.col("id").alias("a_id"), F.col("s").alias("a_s"), F.col("e").alias("a_e"))
        b = iv.select(F.col("k"), F.col("id").alias("b_id"), F.col("s").alias("b_s"), F.col("e").alias("b_e"))
        naive = a.join(b, "k").filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
        )
        grid = interval_overlap_pairs(
            iv, key="k", id_col="id", start="s", end="e", cell_days=CELL_DAYS
        )
        _, n_naive = run("naive", naive)
        _, n_grid = run("grid", grid)
        assert n_naive == n_grid, (n_naive, n_grid)
        iv.unpersist()


if __name__ == "__main__":
    main()
