#!/usr/bin/env python
"""Measure PQ-ADC scoring two ways (SCALE.md evidence for the
q_pq_adc_topk design choice): the registered JVM path (per-probe LUTs
inlined as literal arrays, codegen'd Σ_m lut[m][code_m] over the codes
scan) vs an Arrow/numpy mapInPandas gather (LUT tensor broadcast,
vectorized take + sum per batch).

Same inflated corpus, same probes, same top-k window; neighbor-id sets
asserted identical per (query, rank).

Run: python tools/measure_adc.py [DUP] [N_PROBES] (default 20 -> 100k
codes, 16 probes)

Finding (r6, idle machine, local[32], sf0.1 embeddings inflated):

    40k codes x 16 probes    jvm-lut  6.1 s    numpy-adc 2.6 s   (2.4x)
    100k codes x 48 probes   jvm-lut 13.1 s    numpy-adc 4.3 s   (3.1x)

Identical neighbor sets at every size. The literal-LUT expression tree
grows with probes x n_codes, is interpreted per code row, and its
struct explode multiplies rows n_probes x BEFORE any filter; the Arrow
gather broadcasts the same LUTs once and evaluates them as vectorized
numpy takes. The gap widens with probe count, so the registered
operator (pq_adc_topk) uses the Arrow path since r6; the expression
form stays as pq_adc_topk_expr (zero-Python reference, bit-identical
results — the rounding and rank window stay in the JVM either way).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spring_cloud_kafka_streams_dbz_etl_spark.operators.similarity import (  # noqa: E402
    pq_adc_topk,
    pq_adc_topk_expr,
    pq_encode,
)
from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DUP = int(sys.argv[1]) if len(sys.argv) > 1 else 20
N_PROBES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
TOPK = 10


def main() -> None:
    spark = get_spark()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.select("vec_id", "embedding")
    n0 = base.count()
    corpus = base
    for i in range(1, DUP):
        corpus = corpus.unionByName(
            base.select((F.col("vec_id") + i * n0).alias("vec_id"), "embedding")
        )
    codes = pq_encode(corpus, id_col="vec_id", vec_col="embedding").persist()
    n = codes.count()
    queries_pd = emb.limit(N_PROBES).toPandas()
    print(f"{n:,} codes, {N_PROBES} probes, top-{TOPK}")

    t0 = time.perf_counter()
    a = pq_adc_topk_expr(queries_pd, codes, k=TOPK).collect()
    ta = time.perf_counter() - t0
    print(f"  jvm-lut  : {ta:6.2f} s  ({len(a)} rows)")

    t0 = time.perf_counter()
    b = pq_adc_topk(queries_pd, codes, k=TOPK).collect()
    tb = time.perf_counter() - t0
    print(f"  numpy-adc: {tb:6.2f} s  ({len(b)} rows)")

    ka = sorted((r.query_id, r.rank, r.neighbor_id) for r in a)
    kb = sorted((r.query_id, r.rank, r.neighbor_id) for r in b)
    assert ka == kb, "neighbor sets diverge"
    print(f"  identical neighbor sets; numpy/jvm = {tb/ta:.2f}x")


if __name__ == "__main__":
    main()
