#!/usr/bin/env python
"""Measure zone-map file skipping under three physical layouts
(SCALE.md evidence for the q_zorder_layout / q_zone_map_skip claims).

Same table (orders), same 64-file budget, three layouts:

  hash    — files by hash(o_orderkey): no clustering, the zone-map
            worst case (every file spans ~the full domain)
  sortkey — files by range on o_custkey alone: the classic single-dim
            sorted layout
  zorder  — files by the 12-top-bits of the 32-bit Morton code over
            (o_custkey, o_totalprice): q_zorder_layout's layout

For a deterministic probe workload (custkey-band-only, price-band-only,
and 2-D-box probes), counts the files a zone-map scan layer must touch
(min/max intersects the probe on every predicate column). Lower = more
I/O skipped at the footer.

Run: python tools/measure_zorder.py

Finding (r6, sf0.1 orders = 150k rows, 64 files, 60 probes/family;
cells are avg files touched / avg fraction of rows scanned):

    probe family        hash            sortkey           zorder
    cust-band       64/64  100%      2.3/64   3.7%     8.7/64  13.6%
    price-band      64/64  100%     64.0/64 100.0%    14.5/64  22.7%
    2d-box          64/64  100%      2.3/64   3.7%     2.0/64   3.1%

The single-dim sorted layout is unbeatable on its own key and BLIND on
the other (every file spans the full price domain); z-order pays a ~4x
dilution on the sorted key to prune BOTH dimensions, and on 2-D probes
it beats the dedicated sort outright (2.0 vs 2.3 files). hash = the
zone-map worst case: without clustering, footer stats prune nothing.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spring_cloud_kafka_streams_dbz_etl_spark.catalog import table  # noqa: E402
from spring_cloud_kafka_streams_dbz_etl_spark.operators.layout import (  # noqa: E402
    min_max_bucket,
    z_file_id,
    z_value,
)
from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
Z_BITS = 16
N_FILES = 64
N_PROBES = 60  # per probe family
CUST_BAND = 0.02  # probe widths as a fraction of each domain
PRICE_BAND = 0.10


def zone_maps(o, file_id):
    rows = (
        o.select(
            "o_custkey", "o_totalprice", file_id.alias("fid")
        )
        .groupBy("fid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_custkey").alias("lo_c"),
            F.max("o_custkey").alias("hi_c"),
            F.min("o_totalprice").alias("lo_p"),
            F.max("o_totalprice").alias("hi_p"),
        )
        .collect()
    )
    return [(r.n, float(r.lo_c), float(r.hi_c), float(r.lo_p), float(r.hi_p)) for r in rows]


def mixed(i: int, salt: str) -> float:
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16) / 0xFFFFFFFF


def probes(lo_c, hi_c, lo_p, hi_p):
    """(c_lo, c_hi, p_lo, p_hi) with None = unconstrained dimension."""
    span_c, span_p = hi_c - lo_c, hi_p - lo_p
    fams = {"cust-band": [], "price-band": [], "2d-box": []}
    for i in range(N_PROBES):
        c0 = lo_c + mixed(i, "c") * span_c * (1 - CUST_BAND)
        p0 = lo_p + mixed(i, "p") * span_p * (1 - PRICE_BAND)
        fams["cust-band"].append((c0, c0 + span_c * CUST_BAND, None, None))
        fams["price-band"].append((None, None, p0, p0 + span_p * PRICE_BAND))
        fams["2d-box"].append((c0, c0 + span_c * CUST_BAND, p0, p0 + span_p * PRICE_BAND))
    return fams


def touched(zm, probe):
    c0, c1, p0, p1 = probe
    files = rows = 0
    total_rows = sum(n for n, *_ in zm)
    for n, lo_c, hi_c, lo_p, hi_p in zm:
        if c0 is not None and (hi_c < c0 or lo_c > c1):
            continue
        if p0 is not None and (hi_p < p0 or lo_p > p1):
            continue
        files += 1
        rows += n
    return files, rows / total_rows


def main() -> None:
    spark = get_spark()
    o = table(spark, SF_DIR, "orders").persist()
    g = o.agg(
        F.min(F.col("o_custkey").cast("double")).alias("lo_a"),
        F.max(F.col("o_custkey").cast("double")).alias("hi_a"),
        F.min(F.col("o_totalprice").cast("double")).alias("lo_b"),
        F.max(F.col("o_totalprice").cast("double")).alias("hi_b"),
    )
    b = g.collect()[0]
    oc = o.crossJoin(F.broadcast(g))
    ba = min_max_bucket(F.col("o_custkey"), F.col("lo_a"), F.col("hi_a"), Z_BITS)
    bb = min_max_bucket(F.col("o_totalprice"), F.col("lo_b"), F.col("hi_b"), Z_BITS)
    layouts = {
        "hash": zone_maps(o, F.pmod(F.hash("o_orderkey"), F.lit(N_FILES))),
        "sortkey": zone_maps(oc, F.least(F.lit(N_FILES - 1), F.floor(ba / ((1 << Z_BITS) / N_FILES)).cast("int"))),
        "zorder": zone_maps(oc, z_file_id(z_value([ba, bb], Z_BITS), 2 * Z_BITS, N_FILES)),
    }
    fams = probes(b.lo_a, b.hi_a, b.lo_b, b.hi_b)
    print(f"{'probe family':12s}" + "".join(f"{name:>22s}" for name in layouts))
    for fam, ps in fams.items():
        cells = []
        for zm in layouts.values():
            fs, rf = zip(*(touched(zm, p) for p in ps))
            cells.append(f"{sum(fs)/len(fs):5.1f}/{N_FILES} files {100*sum(rf)/len(rf):4.1f}%")
        print(f"{fam:12s}" + "".join(f"{c:>22s}" for c in cells))
    o.unpersist()


if __name__ == "__main__":
    main()
