#!/usr/bin/env python
"""Measure blocked-join occupancy: naive blocks vs prefix-filter buckets.

The quadratic cost of a blocked similarity self-join is Sum(|bucket|^2)
over join-key buckets. This tool prints that statistic for
q_ngram_jaccard's two candidate strategies on real data:

- naive: the r04 (lang, source, len_bucket) blocked self-join —
  occupancy is whatever the corpus distribution gives (unbounded).
- prefix: the r05 prefix-filter join keyed on each doc's rarest
  |g| - ceil(t|g|) + 1 grams — occupancy bounded by gram rarity.

Usage: python tools/measure_blocking.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def describe(df, keys, label):
    sizes = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    stats = sizes.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.sum("n").alias("rows"),
        F.max("n").alias("max"),
        F.expr("percentile(n, array(0.5, 0.9, 0.99))").alias("p"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
    ).collect()[0]
    print(
        f"{label:8s} buckets={stats['buckets']:>8,} rows={stats['rows']:>9,} "
        f"p50={stats['p'][0]:.0f} p90={stats['p'][1]:.0f} p99={stats['p'][2]:.0f} "
        f"max={stats['max']:,}  candidate work Σ|b|² = {stats['sum_sq']:,}"
    )
    return stats["sum_sq"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.dedup import shingle
    from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark, tune

    spark = get_spark()
    tune(spark)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    base = (
        d.filter(F.size(toks) >= 2)
        .select(
            "doc_id",
            "lang",
            "source",
            F.floor(F.col("n_chars") / 100).cast("int").alias("len_bucket"),
            shingle(toks, 2).alias("grams"),
        )
        .persist()
    )
    n_docs = base.count()
    print(f"{sf_dir}: {n_docs:,} docs")

    naive = describe(base, ["lang", "source", "len_bucket"], "naive")

    # prefix-filter join keys: (gram, lang, source, len_bucket) over each
    # doc's rarest |g| - ceil(0.3|g|) + 1 grams (mirrors
    # operators/dedup.py::prefix_filter_candidates)
    ex = base.select("doc_id", "lang", "source", "len_bucket", F.explode("grams").alias("gram"))
    freq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        ex.join(freq, "gram")
        .groupBy("doc_id", "lang", "source", "len_bucket")
        .agg(F.sort_array(F.collect_list(F.struct("df", "gram"))).alias("s"))
        .select("doc_id", "lang", "source", "len_bucket", F.col("s.gram").alias("g"))
    )
    n = F.size("g")
    p = n - F.floor((n * 3 + 9) / 10).cast("int") + 1
    prefix = ordered.select(
        "doc_id", "lang", "source", "len_bucket",
        F.explode(F.slice("g", F.lit(1), p)).alias("gram"),
    )
    pf = describe(prefix, ["gram", "lang", "source", "len_bucket"], "prefix")
    print(f"prefix-filter candidate work = {pf / max(naive, 1):.4%} of naive")
    return 0


if __name__ == "__main__":
    sys.exit(main())
