#!/usr/bin/env python
"""Measure the ANN serving ladder (SCALE.md evidence): brute-force cosine
vs IVF cell pruning vs IVF-PQ ADC over an inflated embedding corpus.

Inflates sf0.1 embeddings by DUP x (distinct vec_ids, same 10-cell label
space), materializes as parquet, then times 8-probe top-10 search three
ways plus the one-time PQ encode being amortized.

Run: python tools/measure_ann.py [DUP] (default 20 -> 100k vectors)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spring_cloud_kafka_streams_dbz_etl_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    pq_adc_topk,
    pq_encode,
)
from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DUP = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def timed(label: str, thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    dt = time.perf_counter() - t0
    print(f"{label:>26s}: {dt:7.2f} s")
    return dt


def main() -> None:
    spark = get_spark("ann-measure")
    src = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n0 = src.count()
    copies = [
        src.withColumn("vec_id", F.col("vec_id") + F.lit(i * n0)) for i in range(DUP)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    base = tempfile.mkdtemp(prefix="annmeasure_")
    big.write.mode("overwrite").parquet(f"{base}/emb")
    e = spark.read.parquet(f"{base}/emb")
    print(f"corpus: {e.count():,} vectors (DUP={DUP}), 10 cells")

    probes_df = e.filter(F.col("vec_id") < 8)
    probes_pd = probes_df.toPandas()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # one-time encode being amortized (map-only; at scale this also cuts
    # the stored bytes 32x)
    encode_t = timed("pq encode (once)", lambda: noop(
        pq_encode(e, keep_cols=("label",))
    ))
    codes = pq_encode(e, keep_cols=("label",)).select("vec_id", "label", "pq_codes")
    codes.write.mode("overwrite").parquet(f"{base}/codes")
    codes_r = spark.read.parquet(f"{base}/codes")

    for label, thunk in (
        ("brute force", lambda: noop(brute_force_topk(probes_df, e, k=10))),
        ("IVF (cell join)", lambda: noop(
            brute_force_topk(probes_df, e, k=10, cell_col="label")
        )),
        ("IVF-PQ ADC", lambda: noop(
            pq_adc_topk(probes_pd, codes_r, k=10, cell_col="label")
        )),
        ("PQ ADC (no cell)", lambda: noop(pq_adc_topk(probes_pd, codes_r, k=10))),
    ):
        ts = [timed(f"{label} (run {i})", thunk) for i in (1, 2, 3)]
        print(f"{label:>26s}  median {sorted(ts)[1]:.2f} s")
    print(f"encode amortized once: {encode_t:.2f} s")


if __name__ == "__main__":
    main()
