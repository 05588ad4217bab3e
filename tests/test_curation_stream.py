"""Incremental curation topology: gates per micro-batch, cross-shard
exact dedup with the sink as the state."""

from __future__ import annotations

import tempfile
import uuid

import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from spring_cloud_kafka_streams_dbz_etl_spark.operators.curation import CurationConfig
from spring_cloud_kafka_streams_dbz_etl_spark.streaming.curation import (
    CurationStreamConfig,
    build_curation_stream,
    read_curated,
)
from spring_cloud_kafka_streams_dbz_etl_spark.streaming.registry import StreamRegistry


def _tmp(kind: str) -> str:
    return tempfile.mkdtemp(prefix=f"cur_stream_{kind}_{uuid.uuid4().hex[:8]}_")


def test_incremental_curation_dedups_across_shards(spark, sf_smoke):
    src_dir, out, ckpt = _tmp("src"), _tmp("out"), _tmp("ckpt")
    docs = pq.read_table(f"{sf_smoke}/documents.parquet")
    half = docs.filter(pc.less(docs["doc_id"], 250))
    pq.write_table(half, f"{src_dir}/documents.parquet")

    cfg = CurationStreamConfig(
        src_dir=src_dir,
        out_path=out,
        checkpoint=ckpt,
        curation=CurationConfig(lang_stopword_min=0.05, quality_min=0.5),
    )
    reg = StreamRegistry()
    reg.register("curate", build_curation_stream(spark, cfg), checkpoint=ckpt)
    reg.process_available("curate")

    phase1 = read_curated(spark, out).collect()
    assert phase1, "phase 1 should curate some docs"
    # gates enforced
    assert all(r.quality >= 0.5 for r in phase1)
    # in-batch dedup: content hashes unique
    hashes1 = [r.content_hash for r in phase1]
    assert len(hashes1) == len(set(hashes1))

    # shard 2: same docs under NEW ids (re-crawl duplicates) + the rest
    import os

    rest = docs.filter(pc.greater_equal(docs["doc_id"], 250))
    dup = half.set_column(
        0, "doc_id", pc.add(half["doc_id"], 10_000)  # same text, new ids
    )
    import pyarrow as pa

    shard2 = pa.concat_tables([dup, rest])
    pq.write_table(shard2, f"{src_dir}/.documents2.parquet.tmp")
    os.rename(f"{src_dir}/.documents2.parquet.tmp", f"{src_dir}/documents2.parquet")
    reg.process_available("curate")
    reg.stop("curate")

    final = read_curated(spark, out).collect()
    hashes = [r.content_hash for r in final]
    # cross-shard dedup: the re-crawled duplicates must NOT re-enter
    assert len(hashes) == len(set(hashes))
    # originals kept their phase-1 ids (first writer wins)
    by_hash = {r.content_hash: r.doc_id for r in final}
    for r in phase1:
        assert by_hash[r.content_hash] == r.doc_id
    # phase-2 genuinely-new docs were admitted
    assert len(final) > len(phase1)
    # the final corpus equals the batch curation of the full unique set
    docs_df = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    from spring_cloud_kafka_streams_dbz_etl_spark.functions.textfns import (
        en_stopword_count,
        tokens,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.curation import (
        quality_score,
    )

    toks = tokens(F.col("text"))
    expected = (
        docs_df.filter(en_stopword_count(toks) / F.size(toks) >= 0.05)
        .withColumn("quality", quality_score(F.col("text")))
        .filter(F.col("quality") >= 0.5)
        .select(F.md5("text").alias("content_hash"))
        .distinct()
        .count()
    )
    assert len(final) == expected
