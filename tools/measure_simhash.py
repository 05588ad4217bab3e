#!/usr/bin/env python
"""Measure the 64-bit SimHash fingerprint two ways (SCALE.md evidence
for the q_simhash_near_dup design choice): the JVM form (token explode →
codegen md5 → groupBy with 64 fused vote sums → bit assembly — one
shuffle) vs the Arrow mapInPandas form (md5 via hashlib + vectorized
numpy nibble-bit votes, whole fingerprint computed map-side per doc —
zero shuffle, zero fan-out).

Fingerprints asserted identical row-for-row before timing. The full
q_simhash_near_dup pipeline is timed with each fingerprint form so the
end-to-end effect is measured, not inferred.

Run: python tools/measure_simhash.py [DUP]   (default DUP=4 → 4x corpus)

Finding (r8, idle machine, local[32], sf0.1 documents, 5-repeat medians,
fingerprints exceptAll-identical at every size):

    5k docs  (1x)    jvm 0.63 s    arrow 0.36 s   (1.75x)
    40k docs (8x)    jvm 0.72 s    arrow 0.50 s   (1.44x)
    160k docs (32x)  jvm 1.38 s    arrow 0.89 s   (1.55x)

The Arrow form wins at every size and its edge is data-dependent (the
JVM form pays the |tokens|-row explode and a 64-column vote shuffle
that both grow with corpus; the Arrow form is one map pass), so
q_simhash_near_dup registered the Arrow fingerprint in r8 — the fifth
application of the r6 literal-tree→Arrow recipe. simhash_bits stays as
the zero-Python JVM twin, parity-pinned in tests/test_plans.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spring_cloud_kafka_streams_dbz_etl_spark.catalog import fan_out, table  # noqa: E402
from spring_cloud_kafka_streams_dbz_etl_spark.operators.dedup import (  # noqa: E402
    simhash_bits,
    simhash_bits_arrow,
)
from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = 5


def med(fn) -> float:
    ts = []
    for _ in range(REPEATS):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    dup = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("measure-simhash", cpus=32)
    d = table(spark, SF, "documents")
    if dup > 1:
        d = (
            d.crossJoin(spark.range(dup).select(F.col("id").alias("__d")))
            .withColumn("doc_id", F.col("doc_id") * dup + F.col("__d"))
            .drop("__d")
        )
    docs = fan_out(d, spark).select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("toks")
    )
    docs.cache().count()
    n = docs.count()
    print(f"corpus: {n} docs (dup={dup}, {SF})")

    jvm = simhash_bits(docs, "doc_id", "toks", width=64)
    arrow = simhash_bits_arrow(docs, "doc_id", "toks", width=64)
    diff = jvm.exceptAll(arrow).count() + arrow.exceptAll(jvm).count()
    assert diff == 0, f"fingerprint mismatch: {diff} rows differ"
    print("parity: identical fingerprints")

    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731
    for name, df in (("jvm-explode-agg", jvm), ("arrow-mapinpandas", arrow)):
        print(f"  {name}: median {med(lambda: noop(df)):.2f} s over {REPEATS}")
    docs.unpersist()


if __name__ == "__main__":
    main()
