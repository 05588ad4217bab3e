#!/usr/bin/env python
"""Measure triangle enumeration on hub-heavy graphs: degree-oriented
wedge join (q_triangle_count's plan) vs the naive id-ordered join.

Synthesizes a power-law-ish dup graph — C boilerplate "template hubs"
each connected to H member docs, members within a template densely
inter-connected in rings plus chords — the topology where id-ordered
wedge enumeration explodes (a hub with degree d generates O(d²) wedges
whenever the hub's id sorts low) and degree orientation does not (the
hub is always dst, so it generates ZERO wedges).

Usage: python tools/measure_triangles.py [n_hubs] [hub_degree]
       (default 30 hubs × degree 400 ≈ 24k edges)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark  # noqa: E402


def build_graph(spark, n_hubs: int, hub_degree: int):
    edges = []
    nid = n_hubs  # member ids start after the hub ids 0..n_hubs-1
    for h in range(n_hubs):
        members = list(range(nid, nid + hub_degree))
        nid += hub_degree
        for m in members:
            edges.append((h, m))  # star: hub id sorts LOW — worst case for id order
        for i, m in enumerate(members):  # ring + chord: triangles through the hub
            edges.append((m, members[(i + 1) % hub_degree]))
            edges.append((m, members[(i + 7) % hub_degree]))
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    return spark.createDataFrame(sorted(canon), "vec_a long, vec_b long").repartition(32)


def oriented_plan(pairs):
    deg = (
        pairs.select(F.col("vec_a").alias("node"))
        .unionAll(pairs.select(F.col("vec_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("vec_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("vec_b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("vec_a") < F.col("vec_b"))
    )
    return pairs.join(da, "vec_a").join(db, "vec_b").select(
        F.when(lower_first, F.col("vec_a")).otherwise(F.col("vec_b")).alias("src"),
        F.when(lower_first, F.col("vec_b")).otherwise(F.col("vec_a")).alias("dst"),
    )


def id_plan(pairs):
    # naive orientation: every canonical edge already points low-id -> high-id
    return pairs.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))


def count_triangles(pairs, oriented):
    o1 = oriented.select("src", F.col("dst").alias("d1"))
    o2 = oriented.select(F.col("src").alias("src2"), F.col("dst").alias("d2"))
    wedges = (
        o1.join(o2, F.col("src") == F.col("src2"))
        .filter(F.col("d1") < F.col("d2"))
        .select("src", "d1", "d2")
    )
    canon = pairs.select(F.col("vec_a").alias("ca"), F.col("vec_b").alias("cb"))
    closed = wedges.join(
        canon,
        (F.least("d1", "d2") == F.col("ca")) & (F.greatest("d1", "d2") == F.col("cb")),
        "left_semi",
    )
    return wedges, closed


def main() -> int:
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.graph import (
        triangle_enumerate,
    )

    n_hubs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    hub_degree = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = get_spark("measure-triangles")
    spark.sparkContext.setLogLevel("ERROR")
    pairs = build_graph(spark, n_hubs, hub_degree).persist()
    n_edges = pairs.count()
    print(f"graph: {n_hubs} hubs x deg {hub_degree} -> {n_edges} edges")
    results = {}
    # wedge counts instrument each orientation's shuffle volume; oriented_plan
    # replicates the operator's orientation ONLY for that instrumentation —
    # the measured triangle count for the degree path is the production
    # operator itself (graph.triangle_enumerate).
    for label, plan in (("degree-oriented", oriented_plan), ("id-ordered", id_plan)):
        oriented = plan(pairs)
        wedges, closed = count_triangles(pairs, oriented)
        if label == "degree-oriented":
            closed = triangle_enumerate(pairs, src="vec_a", dst="vec_b")
        t0 = time.time()
        nw = wedges.count()
        tw = time.time() - t0
        t0 = time.time()
        nt = closed.count()
        tt = time.time() - t0
        results[label] = (nw, tw, nt, tt)
        print(
            f"{label:16s} wedges={nw:>12,} ({tw:6.2f}s)  triangles={nt:>10,} ({tt:6.2f}s)"
        )
    (nw_d, _, nt_d, _), (nw_i, _, nt_i, _) = (
        results["degree-oriented"],
        results["id-ordered"],
    )
    assert nt_d == nt_i, "orientations must enumerate the same triangle set"
    print(f"wedge-blowup id/degree = {nw_i / max(1, nw_d):.1f}x (same triangle count)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
