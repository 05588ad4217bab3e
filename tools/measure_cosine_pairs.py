#!/usr/bin/env python
"""Measure blocked cosine pair generation two ways (r7 planning evidence
for the q_embedding_cosine_dup / q_semantic_clusters lineage):

  join-hof — the registered shape: self-join on the label cell, each
             pair row carries BOTH 64-double arrays through the join,
             cosine evaluated as a HOF expression per pair
  cogroup  — groupBy(label).applyInPandas: each vector shuffles ONCE,
             the cell's |cell| x |cell| cosine grid is one BLAS matmul,
             pairs above threshold emitted from the upper triangle

Pair SETS are compared (cosine float sums differ in ulps between the
ascending-d HOF fold and the matmul, so threshold-boundary membership
can differ — any such pairs are counted and printed; a swap would need
the fold-order treatment the ADC/encode swaps used).

Run: python tools/measure_cosine_pairs.py [DUP] (default 8 -> 16k vecs,
cells of ~1.6k)

Finding (r6, idle machine, local[32], threshold 0.35):

    16k vectors, 1.6k/cell:  join-hof 58.3 s   cogroup 3.4 s   (17x)
    81,024 pairs from both, zero membership diffs.

The join form pays twice per pair: both 64-double arrays ride the
shuffle on EVERY pair row, and the HOF fold is interpreted per pair.
The cogroup shuffles each vector once and the pair grid is numpy. The
gap widens quadratically with cell size. The REGISTERED pair generator
(operators/similarity.py::blocked_cosine_pairs) is the cogroup form
since r6 — with the rank-1 sequential-d accumulation instead of plain
matmul, so every raw cosine equals the HOF fold bit-for-bit (pinned
row-for-row in test_blocked_cosine_pairs_equals_join_form; round +
threshold stay JVM-side).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spring_cloud_kafka_streams_dbz_etl_spark.functions.vector import (  # noqa: E402
    cosine,
    to_double,
)
from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DUP = int(sys.argv[1]) if len(sys.argv) > 1 else 8
THRESHOLD = 0.35


def main() -> None:
    spark = get_spark()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.select("vec_id", "label", "embedding")
    n0 = base.count()
    corpus = base
    for i in range(1, DUP):
        corpus = corpus.unionByName(
            base.select((F.col("vec_id") + i * n0).alias("vec_id"), "label", "embedding")
        )
    e = corpus.select(
        "vec_id", "label", to_double(F.col("embedding")).alias("v")
    ).persist()
    n = e.count()
    cells = e.groupBy("label").count().count()
    print(f"{n:,} vectors over {cells} cells (~{n // cells:,}/cell)")

    a = e.select(F.col("vec_id").alias("vec_a"), "label", F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), "label", F.col("v").alias("vb"))
    joined = (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("c"))
        .filter(F.col("c") >= THRESHOLD)
    )
    t0 = time.perf_counter()
    pairs_a = set((r.vec_a, r.vec_b) for r in joined.collect())
    ta = time.perf_counter() - t0
    print(f"  join-hof: {ta:6.2f} s   {len(pairs_a):,} pairs")

    def cell_pairs(pdf):
        import numpy as np
        import pandas as pd

        V = np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        ids = pdf["vec_id"].to_numpy()
        norms = np.sqrt((V * V).sum(axis=1))
        Vn = V / norms[:, None]
        G = Vn @ Vn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = np.round(G[iu, ju], 6) >= THRESHOLD
        va, vb = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi})

    cg = e.groupBy("label").applyInPandas(cell_pairs, "vec_a long, vec_b long")
    t0 = time.perf_counter()
    pairs_b = set((r.vec_a, r.vec_b) for r in cg.collect())
    tb = time.perf_counter() - t0
    print(f"  cogroup : {tb:6.2f} s   {len(pairs_b):,} pairs")
    boundary = pairs_a ^ pairs_b
    print(f"  boundary-membership diffs: {len(boundary)}   cogroup/join = {tb/ta:.2f}x")


if __name__ == "__main__":
    main()
