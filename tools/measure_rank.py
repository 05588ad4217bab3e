"""Measure the distributed exact rank vs the naive global-window NTILE.

VERDICT r05 flagged q_quantile_bins' single-partition NTILE sort; round 6
replaced it with operators/rank.py::global_rank (approx_percentile range
buckets -> per-bucket row_number -> broadcast offsets). This harness
quantifies the fix at sizes where the single task actually hurts: a
synthetic (value, key) relation of N rows, equi-depth binned both ways,
identical outputs asserted.

Run: python tools/measure_rank.py [n_rows ...]   (default 2M, 10M)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import Window
from pyspark.sql import functions as F

from spring_cloud_kafka_streams_dbz_etl_spark.operators.rank import global_rank
from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark

K = 10


def synth(spark, n: int):
    # deterministic pseudo-random doubles; key is unique -> strict order
    return spark.range(n).select(
        F.col("id").alias("key"),
        ((F.col("id") * 2654435761) % 2147483647).cast("double").alias("v"),
    )


def bins_naive(df):
    w = Window.orderBy("v", "key")
    return (
        df.select("v", F.ntile(K).over(w).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi"))
    )


def bins_distributed(df):
    ranked = global_rank(df, ["v", "key"], rank_col="r", total_col="t")
    k = F.lit(K)
    qsz = F.floor(F.col("t") / k)
    rem = F.col("t") % k
    big = rem * (qsz + F.lit(1))
    r = F.col("r")
    b = (
        F.when(r <= big, F.floor((r - F.lit(1)) / (qsz + F.lit(1))) + F.lit(1))
        .otherwise(rem + F.floor((r - big - F.lit(1)) / F.greatest(qsz, F.lit(1))) + F.lit(1))
        .cast("int")
    )
    return (
        ranked.select("v", b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi"))
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2_000_000, 10_000_000]
    spark = get_spark("rank-measure", cpus=32)
    for n in sizes:
        df = synth(spark, n)
        out = {}
        for label, fn in (("naive-ntile", bins_naive), ("global_rank", bins_distributed)):
            t0 = time.time()
            rows = sorted(map(tuple, fn(df).collect()))
            out[label] = (round(time.time() - t0, 2), rows)
        assert out["naive-ntile"][1] == out["global_rank"][1], "results diverge"
        print(
            f"n={n:,}: naive {out['naive-ntile'][0]} s vs "
            f"global_rank {out['global_rank'][0]} s (identical bins)"
        )


if __name__ == "__main__":
    main()
