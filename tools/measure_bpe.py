"""Rounds-vs-merges cost for the distributed BPE trainer (VERDICT r11
ask #5): run `_bpe_train_merges` at increasing depth on sf0.1, report
seconds-per-round and the word-histogram size, so SCALE.md can price
the 32k-merge regime instead of assuming it.

Usage: python tools/measure_bpe.py [sf_dir] [depths...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    depths = [int(x) for x in sys.argv[2:]] or [8, 16, 32]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spring_cloud_kafka_streams_dbz_etl_spark.catalog import table
    from spring_cloud_kafka_streams_dbz_etl_spark.queries.text import (
        _bpe_train_merges,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.session import tune

    tune(spark)
    d = table(spark, sf_dir, "documents")
    hist = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
    )
    n_words = hist.count()
    print(f"sf_dir={sf_dir} word_histogram_rows={n_words}")
    prev_total = 0.0
    prev_depth = 0
    for depth in depths:
        t0 = time.monotonic()
        out, _ = _bpe_train_merges(spark, sf_dir, depth)
        total = time.monotonic() - t0
        marginal = (total - prev_total) / max(1, depth - prev_depth)
        print(
            f"depth={depth} total_s={total:.2f} "
            f"s_per_round={total / depth:.3f} "
            f"marginal_s_per_round_vs_prev={marginal:.3f} "
            f"final_vocab={out[-1][4]}"
        )
        prev_total, prev_depth = total, depth


if __name__ == "__main__":
    main()
