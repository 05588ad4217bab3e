#!/usr/bin/env python
"""Deep-fuzz session for the custom-operator invariants.

The committed hypothesis suites run 6-8 derandomized examples each so CI
stays affordable; this tool re-runs the highest-risk invariants with an
order of magnitude more examples and a fresh random seed — the
between-rounds confidence pass. Run on an idle machine; a failure prints
the shrunk counterexample.

Covered (operator → invariant):
- global_rank        == single-partition Window row_number (NULLs FIRST,
                        duplicates, any bucket count)
- simhash_bits_arrow == simhash_bits row-for-row on random token corpora
- interval_overlap   grid-cell join == quadratic bruteforce

Run: python tools/deep_fuzz.py [EXAMPLES]   (default 60 per invariant)
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
rng = random.Random()
SEED = rng.randrange(1 << 30)
rng.seed(SEED)


def fuzz_global_rank(spark) -> None:
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.rank import global_rank

    for i in range(N):
        n = rng.randint(1, 400)
        vals = [
            None if rng.random() < 0.15 else rng.randint(-5, 5)
            if rng.random() < 0.5
            else rng.randint(-(10**9), 10**9)
            for _ in range(n)
        ]
        buckets = rng.choice([1, 2, 3, 8, 32, 64])
        df = spark.createDataFrame(
            [(j, v) for j, v in enumerate(vals)], "id long, v long"
        )
        got = {
            r["id"]: (r["rank"], r["total"])
            for r in global_rank(df, ["v", "id"], n_buckets=buckets).collect()
        }
        w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
        exp = {
            r["id"]: (r["rank"], n)
            for r in df.withColumn(
                "rank", F.row_number().over(w).cast("long")
            ).collect()
        }
        assert got == exp, (SEED, i, buckets, vals)
    print(f"global_rank: {N} cases OK")


def fuzz_simhash_twins(spark) -> None:
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.dedup import (
        simhash_bits,
        simhash_bits_arrow,
    )

    vocab = [f"tok{c}" for c in range(50)]
    for i in range(N):
        docs = []
        for d in range(rng.randint(1, 60)):
            n = rng.randint(0, 30)
            toks = [
                None if rng.random() < 0.05 else rng.choice(vocab)
                for _ in range(n)
            ]
            if rng.random() < 0.05:
                toks = None
            docs.append((d, toks))
        df = spark.createDataFrame(docs, "doc_id long, toks array<string>")
        width = rng.choice([8, 40, 64])
        a = simhash_bits_arrow(df, "doc_id", "toks", width=width)
        j = simhash_bits(df, "doc_id", "toks", width=width)
        assert a.exceptAll(j).count() == 0 and j.exceptAll(a).count() == 0, (
            SEED,
            i,
            width,
            docs,
        )
    print(f"simhash twins: {N} cases OK")


def fuzz_interval_overlap(spark) -> None:
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.temporal import (
        interval_overlap_pairs,
    )
    import datetime

    base = datetime.date(2024, 1, 1)
    for i in range(N // 3):  # each case is two Spark jobs; keep it sane
        rows = []
        for r in range(rng.randint(2, 40)):
            key = rng.randint(0, 2)
            s = rng.randint(0, 60)
            e = s + rng.randint(0, 20)
            rows.append(
                (
                    r,
                    key,
                    base + datetime.timedelta(days=s),
                    base + datetime.timedelta(days=e),
                )
            )
        df = spark.createDataFrame(
            rows, "iv_id long, key long, d_start date, d_end date"
        )
        got = {
            (r["a_id"], r["b_id"])
            for r in interval_overlap_pairs(
                df, key="key", id_col="iv_id",
                start="d_start", end="d_end",
                cell_days=rng.choice([3, 7, 30]),
            ).collect()
        }
        exp = set()
        for (ra, ka, sa, ea) in rows:
            for (rb, kb, sb, eb) in rows:
                if ra < rb and ka == kb and sa <= eb and sb <= ea:
                    exp.add((ra, rb))
        assert got == exp, (SEED, i, rows)
    print(f"interval_overlap: {N // 3} cases OK")


def main() -> None:
    spark = get_spark("deep-fuzz", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    print(f"seed {SEED}, {N} examples per invariant")
    fuzz_global_rank(spark)
    fuzz_simhash_twins(spark)
    fuzz_interval_overlap(spark)
    print("deep fuzz: ALL OK")


if __name__ == "__main__":
    main()
