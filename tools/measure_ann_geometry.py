"""Settle the ANN recall ceiling: knob-bound or data-bound? (VERDICT r12
ask #3.)

The r12 measurements showed recall@10 EQUALS candidate coverage at every
nprobe point — the refine converts everything delivered — so the full
coverage curve IS the recall ceiling at every width. This tool measures,
at a given SF:

1. the NEIGHBOR-CELL RANK distribution: for each exact top-{TOPK}
   neighbor, the rank of its assigned cell in its query's
   centroid-distance cell ordering (ivf_probe at full width). Coverage
   at width np is exactly P(rank <= np), so one pass yields the entire
   curve out to np = k, past the registered NPROBE_CURVE sweep.
2. the curve vs the UNIFORM baseline np/k: a clustered geometry
   concentrates neighbor cells at low ranks (concave curve, early
   saturation); an unstructured one tracks a straight np/k line offset
   by the rank-1 mass (the query's own cell).
3. the embedding covariance spectrum: flat eigenvalues == no low-dim
   cluster structure for the coarse quantizer to exploit.
4. a CLUSTERED CONTROL with the same (n, dim, k, nprobe) shape —
   deterministic Gaussian clusters pushed through the IDENTICAL
   kmeans_fit / ivf_assign / ivf_probe operators — separating what the
   stack can deliver from what this fixture's geometry allows.

Usage: python tools/measure_ann_geometry.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def rank_curve(spark, e, n, tag):
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.similarity import (
        ivf_assign,
        ivf_probe,
        kmeans_fit,
        nprobe_for,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.queries.similarity import (
        N_PROBE_QUERIES,
        TOPK,
        _exact_topk,
    )

    cents = kmeans_fit(e)
    k = len(cents)
    probes = e.filter(F.col("vec_id") < N_PROBE_QUERIES)
    cell_of = {
        r.vec_id: r.cell for r in ivf_assign(e, cents).select("vec_id", "cell").collect()
    }
    rank_of = {
        (r.vec_id, r.cell): r.probe_rank
        for r in ivf_probe(probes, cents, k).collect()
    }
    gt = _exact_topk(e, probes, spark).collect()
    ranks = np.array(
        [rank_of[(r.query_id, cell_of[r.neighbor_id])] for r in gt], dtype=np.int64
    )
    npb = nprobe_for(k)
    print(f"\n[{tag}] n={n} k={k} default_nprobe={npb} gt_pairs={len(ranks)}")
    print(f"[{tag}] neighbor-cell rank: mean={ranks.mean():.1f} "
          f"median={np.median(ranks):.0f} p90={np.percentile(ranks, 90):.0f} max={ranks.max()}")
    widths = sorted({1, 2, 4, 8, npb, 24, 32, 48, k} & set(range(1, k + 1)))
    for w in widths:
        cov = float((ranks <= w).mean())
        print(f"[{tag}] nprobe={w:3d} coverage={cov:.4f} uniform={w / k:.4f} "
              f"lift={cov / (w / k):.2f}x")
    for target in (0.75, 0.9):
        need = int(np.quantile(ranks, target, method="inverted_cdf"))
        print(f"[{tag}] coverage>={target}: needs nprobe={need} "
              f"(scan fraction {need / k:.2f})")
    return ranks, k


def spectrum(e, tag):
    X = np.array([list(map(float, r.embedding)) for r in e.collect()])
    X = X - X.mean(axis=0)
    ev = np.linalg.eigvalsh(np.cov(X.T))[::-1]
    print(f"\n[{tag}] covariance spectrum: top8/mean = "
          f"{np.round(ev[:8] / ev.mean(), 2).tolist()}  "
          f"(clustered data: top few >> 1; flat: all ~1)", flush=True)


def clustered_control(spark, n, dim, n_clusters, sigma):
    rng = np.random.default_rng(7)
    centers = rng.normal(0.0, 1.0, (n_clusters, dim))
    assign = np.arange(n) % n_clusters
    X = centers[assign] + rng.normal(0.0, sigma, (n, dim))
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spring_cloud_kafka_streams_dbz_etl_spark.catalog import fan_out, table
    from spring_cloud_kafka_streams_dbz_etl_spark.session import tune

    tune(spark)
    e = fan_out(table(spark, sf_dir, "embeddings"), spark)
    n = e.count()
    spectrum(e, "md5-fixture")
    rank_curve(spark, e, n, "md5-fixture")

    # control: same n/dim/k shape, genuinely clustered (64 Gaussian
    # clusters, within-cluster sigma 0.2 vs unit center scale)
    ctrl = fan_out(clustered_control(spark, n, 64, 64, 0.2), spark)
    spectrum(ctrl, "clustered-ctrl")
    rank_curve(spark, ctrl, n, "clustered-ctrl")


if __name__ == "__main__":
    main()
