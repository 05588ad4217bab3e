#!/usr/bin/env python
"""Measure parquet bloom-filter row-group pruning for digest point probes.

Quantifies q_bloom_skip's claim (queries/layout.py): on a digest-keyed
layout, column-level bloom filters reject non-member ROW GROUPS from the
footer alone, while min/max zone maps are useless for high-cardinality
digests (uniform hex strings span every group's min/max range).

For the corpus written exactly as q_bloom_skip writes it, this reads the
footers back with parquet-mr (pyarrow does not expose blooms) and counts,
per probe:
  - zone-map candidates: groups whose [min, max] statistics admit the probe
    (what a reader without blooms must scan);
  - bloom candidates: groups whose bloom filter claims membership (what the
    bloom-aware reader scans — >= the true location count, the excess being
    the false-positive rate).

Probes are split into MEMBERS (digests present in the corpus) and
NON-MEMBERS (digests of strings not in any document), the dedup-service
shape: "is this exact content already in the corpus?" is usually answered
NO, and the no-case cost is what bloom filters buy down.

Usage: python tools/measure_bloom.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_PROBES = 40


def main() -> int:
    from spring_cloud_kafka_streams_dbz_etl_spark.catalog import table
    from spring_cloud_kafka_streams_dbz_etl_spark.queries.layout import (
        BLOOM_PROBE_STRIDE,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark, tune

    spark = get_spark("measure-bloom")
    tune(spark)
    d = table(spark, SF_DIR, "documents")
    path = tempfile.mkdtemp(prefix="bloommeasure_")
    # the q_bloom_skip layout verbatim (same options, same row-group size)
    (
        d.select("doc_id", F.md5("text").alias("digest"), "n_chars")
        .coalesce(4)
        .sortWithinPartitions("doc_id")
        .write.option("parquet.bloom.filter.enabled#digest", "true")
        .option("parquet.bloom.filter.expected.ndv#digest", "100000")
        .option("parquet.block.size", str(8 * 1024))
        .mode("overwrite")
        .parquet(path)
    )
    members = [
        r["digest"]
        for r in d.filter(F.col("doc_id") % BLOOM_PROBE_STRIDE == 0)
        .select(F.md5("text").alias("digest"))
        .limit(N_PROBES)
        .collect()
    ]
    non_members = [
        r["digest"]
        for r in spark.range(N_PROBES)
        .select(F.md5(F.concat(F.lit("not-in-corpus:"), F.col("id"))).alias("digest"))
        .collect()
    ]

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    Binary = jvm.org.apache.parquet.io.api.Binary
    blocks = []  # (min, max, bloom) per row group across all files
    for part in sorted(glob.glob(f"{path}/part-*.parquet")):
        in_file = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path(part), conf
        )
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(in_file)
        try:
            for b in range(reader.getFooter().getBlocks().size()):
                block = reader.getFooter().getBlocks().get(b)
                cols = block.getColumns()
                cc = next(
                    cols.get(i)
                    for i in range(cols.size())
                    if cols.get(i).getPath().toDotString() == "digest"
                )
                stats = cc.getStatistics()
                lo = stats.genericGetMin().toStringUsingUTF8()
                hi = stats.genericGetMax().toStringUsingUTF8()
                bloom = reader.getBloomFilterDataReader(block).readBloomFilter(cc)
                if bloom is None:
                    print("FATAL: row group without a digest bloom filter")
                    return 1
                blocks.append((lo, hi, bloom, Binary))
        finally:
            reader.close()

    def candidates(probe: str) -> tuple[int, int]:
        zone = bloom_hits = 0
        for lo, hi, bloom, Binary in blocks:
            if lo <= probe <= hi:
                zone += 1
            if bloom.findHash(bloom.hash(Binary.fromString(probe))):
                bloom_hits += 1
        return zone, bloom_hits

    n = len(blocks)
    for label, probes in (("member", members), ("non-member", non_members)):
        zs, bs = zip(*(candidates(p) for p in probes))
        print(
            f"{label:10s} probes={len(probes)}  row_groups={n}  "
            f"zone-map candidates avg {sum(zs)/len(zs):.1f} "
            f"({100*sum(zs)/len(zs)/n:.1f}% of groups)  "
            f"bloom candidates avg {sum(bs)/len(bs):.2f} "
            f"({100*sum(bs)/len(bs)/n:.2f}% of groups)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
