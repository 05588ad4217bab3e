"""Recorded-Kafka-transcript mechanics (sources/kafka_replay.py): the
murmur2 partitioner, broker-shaped transcript invariants, and offset/lag
arithmetic. The decoded+enriched replay itself is oracle-checked by
s_kafka_replay in the parity suite."""

from __future__ import annotations

import tempfile
import uuid

from spring_cloud_kafka_streams_dbz_etl_spark.catalog import table
from spring_cloud_kafka_streams_dbz_etl_spark.sources.kafka_replay import (
    KAFKA_SOURCE_SCHEMA,
    default_partition,
    murmur2,
    record_kafka_transcript,
    transcript_end_offsets,
)


def _tmp() -> str:
    return tempfile.mkdtemp(prefix=f"kreplay_{uuid.uuid4().hex[:8]}_")


def test_murmur2_is_java_signed_32bit_and_stable():
    # stable across calls, signed 32-bit range, spreads keys
    vals = {murmur2(str(i).encode()) for i in range(1000)}
    assert len(vals) > 990  # effectively injective on this key set
    assert all(-(1 << 31) <= v < (1 << 31) for v in vals)
    assert murmur2(b"hello") == murmur2(b"hello")
    assert murmur2(b"") == murmur2(b"")
    # tail-byte handling: lengths 1..5 cover every switch arm
    assert len({murmur2(b"x" * n) for n in range(1, 6)}) == 5


def test_default_partition_in_range_and_balanced():
    n = 4
    parts = [default_partition(int(i).to_bytes(8, "big"), n) for i in range(10_000)]
    assert set(parts) <= set(range(n))
    counts = [parts.count(p) for p in range(n)]
    assert min(counts) > 10_000 / n / 2  # no dead partition

def test_transcript_is_broker_shaped(spark, sf_smoke):
    path = _tmp()
    events = table(spark, sf_smoke, "events")
    record_kafka_transcript(events, path, n_partitions=4)
    t = spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(path)
    n = events.count()
    assert t.count() == n
    rows = t.select("partition", "offset", "key", "topic", "timestampType").collect()
    assert {r.topic for r in rows} == {"dbserver1.public.events"}
    assert {r.timestampType for r in rows} == {0}
    # offsets dense per partition starting at 0 (broker append semantics)
    by_part: dict[int, list[int]] = {}
    for r in rows:
        by_part.setdefault(r.partition, []).append(r.offset)
    for p, offs in by_part.items():
        assert sorted(offs) == list(range(len(offs))), p
    # partitions follow the murmur2 default partitioner on the key bytes
    for r in rows[:200]:
        assert r.partition == default_partition(bytes(r.key), 4)
    # end-offset math equals per-partition counts (lag arithmetic input)
    ends = transcript_end_offsets(spark, path)
    assert ends == {p: len(offs) for p, offs in by_part.items()}


def test_sink_transcript_appends_broker_offsets(spark, sf_smoke):
    """kafka_transcript_sink across micro-batches: offsets stay dense per
    partition and CONTINUE from the previous batch's end (broker append),
    partitions follow murmur2 on the key bytes, and the decoded
    round-trip returns exactly the produced rows."""
    from pyspark.sql import functions as F

    from spring_cloud_kafka_streams_dbz_etl_spark.sources.kafka_replay import (
        KAFKA_SOURCE_SCHEMA,
        decode_enriched_transcript,
        default_partition,
        kafka_transcript_sink,
    )

    path = _tmp()
    base = (
        table(spark, sf_smoke, "events")
        .select(
            F.col("event_id").alias("id"),
            "user_id",
            F.lit("n").alias("name"),
            F.lit("SEG").alias("segment"),
            "event_type",
            "value",
        )
        .limit(400)
    )
    sink = kafka_transcript_sink(path, n_partitions=3)
    b1 = base.filter("id % 2 = 0")
    b2 = base.filter("id % 2 = 1")
    sink(b1, 0)
    sink(b2, 1)

    t = spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(path)
    assert t.count() == base.count()
    rows = t.select("partition", "offset", "key", "timestampType").collect()
    assert {r.timestampType for r in rows} == {1}  # LogAppendTime
    by_part: dict[int, list[int]] = {}
    for r in rows:
        assert r.partition == default_partition(bytes(r.key), 3)
        by_part.setdefault(r.partition, []).append(r.offset)
    for p, offs in by_part.items():
        assert sorted(offs) == list(range(len(offs))), (p, sorted(offs)[:5])

    decoded = decode_enriched_transcript(spark, path)
    assert sorted(r.id for r in decoded.collect()) == sorted(
        r.id for r in base.collect()
    )


def test_txn_sink_read_committed_filters_aborted(spark, sf_smoke):
    """Transactional transcript semantics: an aborted attempt's rows stay
    in the raw log (read_uncommitted sees duplicates) but read_committed
    sees exactly one copy — the exactly_once_v2 contract."""
    import pytest
    from pyspark.sql import functions as F

    from spring_cloud_kafka_streams_dbz_etl_spark.sources.kafka_replay import (
        KAFKA_SOURCE_SCHEMA,
        decode_enriched_transcript,
        kafka_transcript_sink,
        read_committed,
    )

    path = _tmp()
    base = (
        table(spark, sf_smoke, "events")
        .select(
            F.col("event_id").alias("id"),
            "user_id",
            F.lit("n").alias("name"),
            F.lit("SEG").alias("segment"),
            "event_type",
            "value",
        )
        .limit(300)
    )
    n = base.count()
    sink = kafka_transcript_sink(
        path,
        n_partitions=3,
        transactional=True,
        abort_first_attempt_epochs=frozenset({0}),
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        sink(base, 0)  # data appended, commit never written
    raw = spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(path)
    assert raw.count() == n  # aborted rows occupy the log

    sink(base, 0)  # retry commits at fresh offsets
    # fresh read: the first DataFrame pinned its file listing at creation
    raw = spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(path)
    assert raw.count() == 2 * n  # read_uncommitted: both attempts
    committed = read_committed(spark, path)
    assert committed.count() == n  # read_committed: exactly once
    # committed rows are the RETRY's offsets (after the aborted range)
    decoded = decode_enriched_transcript(spark, path, committed_only=True)
    assert sorted(r.id for r in decoded.collect()) == sorted(
        r.id for r in base.collect()
    )
