#!/usr/bin/env python
"""Measure the iterative graph operators' per-round behavior at sf0.1:
frontier growth for bounded BFS (q_hop_distance) and the constant-size
rank relation for PageRank (q_pagerank) — the two claims SCALE.md makes
about the Pregel-as-joins shape:

1. BFS work per round tracks the FRONTIER (newly relaxed nodes), not the
   graph: on the bipartite trade graph the frontier saturates after ~2
   hops and later rounds move (near) zero new labels.
2. PageRank's shuffled relation stays 2 columns x |nodes| regardless of
   round — per-round wall time is flat, not growing.

Usage: python tools/measure_graph.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("measure-graph")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey", "o_custkey")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    bridge = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = (
        bridge.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionByName(bridge.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .distinct()
        .persist()
    )
    n_edges = edges.count()
    print(f"edges (directed): {n_edges}")

    # -- BFS frontier growth ------------------------------------------------
    dist = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .filter(F.col("c_nationkey") == 0)
        .select(
            F.concat(F.lit("c"), F.col("c_custkey")).alias("node"),
            F.lit(0).cast("long").alias("dist"),
        )
        .persist()
    )
    reached_prev = dist.count()
    print(f"\nBFS: seeds={reached_prev}")
    print(f"{'hop':>4} {'reached':>9} {'new':>8} {'sec':>7}")
    for hop in range(1, 5):
        t0 = time.time()
        relaxed = edges.join(dist.withColumnRenamed("node", "src"), "src").select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        nxt = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
            .persist()
        )
        reached = nxt.count()
        dt = time.time() - t0
        print(f"{hop:>4} {reached:>9} {reached - reached_prev:>8} {dt:>7.2f}")
        dist.unpersist()
        dist = nxt
        reached_prev = reached

    # -- PageRank flat per-round cost --------------------------------------
    nodes = (
        edges.select(F.col("src").alias("node")).distinct().persist()
    )
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    ).persist()
    outdeg.count()
    ranks = nodes.select("node", (F.lit(1.0) / n).alias("rank"))
    print(f"\nPageRank: nodes={n}")
    print(f"{'round':>6} {'rank rows':>10} {'sec':>7}")
    for r in range(1, 5):
        t0 = time.time()
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.floor(F.col("rank") / F.col("outdeg") * 1e9) / 1e9)
                .cast("decimal(18,9)")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("double").alias("acc"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.floor(
                        (F.lit(0.15) / n + 0.85 * F.coalesce(F.col("acc"), F.lit(0.0)))
                        * 1e9
                    )
                    / 1e9
                ).alias("rank"),
            )
            .persist()
        )
        rows = ranks.count()
        print(f"{r:>6} {rows:>10} {time.time() - t0:>7.2f}")


if __name__ == "__main__":
    main()
