"""Recorded-Kafka-transcript replay: broker-shaped evidence without a broker.

The sandbox has neither a Kafka broker nor the spark-sql-kafka artifact,
so the connector itself (`sources/streams.py::kafka_cdc_source`) cannot
execute here. This module closes the rest of the gap: it RECORDS a
transcript — rows byte-identical to what ``.format("kafka").load()``
yields (key/value binary, topic, partition, offset, timestamp,
timestampType), with Confluent-framed Avro values produced by the
engine's own codec and partitions assigned by Kafka's actual default
partitioner (murmur2, Apache Kafka ``Utils.murmur2`` — public algorithm)
— and REPLAYS it as a stream through the production decode + enrich
topology. Everything downstream of the socket runs on real wire bytes;
only the network client remains untested (KAFKA.md carries the recipe
for running that against the reference's docker-compose topology).

Reference parity: the transcript is the durable topic (§2A #1), offsets
are per-partition and dense like broker offsets (#18), and the replayed
consumer is the same micro-batch machinery a Kafka-fed query uses.
"""

from __future__ import annotations

import json as _json
import os as _os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Exactly the schema Spark's Kafka source produces (minus headers, which
# are opt-in via includeHeaders).
KAFKA_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)

_M = 0x5BD1E995
_MASK = 0xFFFFFFFF


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 (32-bit, seed 0x9747b28c) — the hash behind the
    default producer partitioner, ported from the public Apache Kafka
    ``Utils.murmur2``. Returns the SIGNED 32-bit value Java would."""
    length = len(data)
    h = (0x9747B28C ^ length) & _MASK
    n4 = length & ~3
    for i in range(0, n4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * _M) & _MASK
        k ^= k >> 24
        k = (k * _M) & _MASK
        h = (h * _M) & _MASK
        h ^= k
    rem = length & 3
    if rem == 3:
        h ^= (data[n4 + 2] & 0xFF) << 16
    if rem >= 2:
        h ^= (data[n4 + 1] & 0xFF) << 8
    if rem >= 1:
        h ^= data[n4] & 0xFF
        h = (h * _M) & _MASK
    h ^= h >> 13
    h = (h * _M) & _MASK
    h ^= h >> 15
    return h - (1 << 32) if h >= (1 << 31) else h


def default_partition(key: bytes, n_partitions: int) -> int:
    """Kafka DefaultPartitioner for keyed records: toPositive(murmur2) % n."""
    return (murmur2(key) & 0x7FFFFFFF) % n_partitions


def record_kafka_transcript(
    events: DataFrame,
    path: str,
    topic: str = "dbserver1.public.events",
    n_partitions: int = 4,
    schema_id: int = 7,
    append: bool = False,
) -> None:
    """Produce the transcript: each event becomes a Debezium-style change
    envelope, Avro-encoded and Confluent-framed by the engine codec on
    EXECUTORS (Arrow-batched — the producer side is distributed), keyed by
    the record id's 8-byte big-endian bytes, partitioned by murmur2 like a
    real producer, with dense per-partition offsets in event_id order.

    ``append=True``: broker-append a second production session — offsets
    continue from the transcript's current per-partition ends (what a
    broker does implicitly; required for a consumer to see the new
    records as NEW offsets).

    Scale: encode is map-only; the only shuffle is the per-partition
    offset window — which a real broker performs implicitly by appending.
    """
    import pandas as pd

    from .avro_codec import EVENTS_ENVELOPE_AVSC, AvroCodec, confluent_frame

    n_parts = n_partitions

    def produce(batches):
        codec = AvroCodec(EVENTS_ENVELOPE_AVSC)
        for pdf in batches:
            keys, values, parts = [], [], []
            for r in pdf.itertuples(index=False):
                key = int(r.event_id).to_bytes(8, "big")
                envelope = {
                    "before": None,
                    "after": {
                        "id": int(r.event_id),
                        "user_id": int(r.user_id),
                        "event_type": None if r.event_type is None else str(r.event_type),
                        "value": None if pd.isna(r.value) else float(r.value),
                    },
                    "source": {"table": "events", "lsn": int(r.event_id)},
                    "op": "c",
                    "ts_ms": None,
                }
                keys.append(key)
                values.append(confluent_frame(schema_id, codec.encode(envelope)))
                parts.append(default_partition(key, n_parts))
            yield pd.DataFrame(
                {
                    "key": keys,
                    "value": values,
                    "partition": pd.array(parts, dtype="int32"),
                    "event_id": pdf["event_id"],
                    "timestamp": pdf["ts"],
                }
            )

    produced = events.select(
        "event_id", "user_id", "event_type", "value", F.col("ts").cast("timestamp").alias("ts")
    ).mapInPandas(
        produce,
        "key binary, value binary, partition int, event_id long, timestamp timestamp",
    )
    w = Window.partitionBy("partition").orderBy("event_id")
    offset = (F.row_number().over(w) - 1).cast("long")
    if append and _os.path.exists(path):
        base = transcript_end_offsets(events.sparkSession, path)
        if base:
            base_map = F.create_map(
                *[x for p, e in base.items() for x in (F.lit(p), F.lit(e))]
            )
            offset = offset + F.coalesce(
                F.element_at(base_map, F.col("partition")), F.lit(0).cast("long")
            )
    transcript = produced.select(
        "key",
        "value",
        F.lit(topic).alias("topic"),
        "partition",
        offset.alias("offset"),
        "timestamp",
        F.lit(0).alias("timestampType"),  # CreateTime
    )
    transcript.write.mode("append" if append else "overwrite").parquet(path)


def replay_kafka_transcript(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The transcript as a streaming DataFrame with the Kafka source's
    exact schema — a drop-in stand-in for ``kafka_cdc_source`` whose rows
    are byte-identical to broker-fed ones."""
    reader = spark.readStream.schema(KAFKA_SOURCE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def transcript_end_offsets(spark: SparkSession, path: str) -> dict[int, int]:
    """Per-partition end offsets (max committed + 1) — the
    ``AdminClient.listOffsets(latest)`` analogue over a transcript, used
    for lag math against a consumer's committed positions."""
    rows = (
        spark.read.schema(KAFKA_SOURCE_SCHEMA)
        .parquet(path)
        .groupBy("partition")
        .agg((F.max("offset") + 1).alias("end"))
        .collect()
    )
    return {int(r["partition"]): int(r["end"]) for r in rows}


# -- sink-side transcript (§2A #14, the produce half) -----------------------

ENRICHED_RECORD_AVSC = _json.dumps(
    {
        "type": "record",
        "name": "EnrichedEvent",
        "namespace": "entity.events",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "user_id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "segment", "type": "string"},
            {"name": "event_type", "type": ["null", "string"]},
            {"name": "value", "type": ["null", "double"]},
        ],
    }
)


def enriched_record_producer(
    schema_id: int, n_partitions: int, with_rec_id: bool = False
):
    """mapInPandas closure encoding enriched output rows as Kafka records:
    8-byte big-endian id key, Confluent-framed Avro value (engine codec),
    murmur2 default partition. ONE copy of the encoder shared by the
    foreachBatch sink (kafka_transcript_sink) and the pluggable-sink
    topology (s_python_sink); ``with_rec_id`` carries the record id for
    the sink's per-partition offset window."""

    def produce(batches):
        import pandas as pd

        from .avro_codec import AvroCodec, confluent_frame

        codec = AvroCodec(ENRICHED_RECORD_AVSC)
        for pdf in batches:
            keys, values, parts = [], [], []
            for r in pdf.itertuples(index=False):
                key = int(r.id).to_bytes(8, "big")
                rec = {
                    "id": int(r.id),
                    "user_id": int(r.user_id),
                    "name": str(r.name),
                    "segment": str(r.segment),
                    "event_type": None if r.event_type is None else str(r.event_type),
                    "value": None if pd.isna(r.value) else float(r.value),
                }
                keys.append(key)
                values.append(confluent_frame(schema_id, codec.encode(rec)))
                parts.append(default_partition(key, n_partitions))
            out = {
                "key": keys,
                "value": values,
                "partition": pd.array(parts, dtype="int32"),
            }
            if with_rec_id:
                out["rec_id"] = pdf["id"]
            yield pd.DataFrame(out)

    return produce


def encode_enriched(
    df: DataFrame, schema_id: int, n_partitions: int, with_rec_id: bool = False
) -> DataFrame:
    """Enriched rows -> framed Kafka records via the VECTORIZED Arrow
    kernel (sources/avro_vec.py) — byte-identical to
    :func:`enriched_record_producer` (bit-parity pinned by
    tests/test_avro_vec.py) at whole-batch NumPy speed instead of
    ~13 µs/row of recursive Python (guide §4.2). The row-path producer
    is retained below as the wire-format reference implementation."""
    from .avro_vec import encode_enriched_batch

    def produce(batches):
        for b in batches:
            if b.num_rows:
                yield encode_enriched_batch(b, schema_id, n_partitions, with_rec_id)

    schema = "key binary, value binary, partition int"
    if with_rec_id:
        schema += ", rec_id long"
    return df.select("id", "user_id", "name", "segment", "event_type", "value").mapInArrow(
        produce, schema
    )


def kafka_transcript_sink(
    path: str,
    topic: str = "entity.events.enriched",
    n_partitions: int = 4,
    schema_id: int = 9,
    transactional: bool = False,
    abort_first_attempt_epochs: frozenset[int] = frozenset(),
):
    """A ``foreachBatch`` sink with ``kafka_sink_writer``'s semantics
    executed for real, minus only the socket: every enriched output row
    is Avro-encoded (Confluent-framed) by the engine codec on EXECUTORS,
    keyed by the entity id's 8-byte big-endian bytes, partitioned by the
    murmur2 default partitioner, and APPENDED with dense per-partition
    offsets continuing from the transcript's current ends — broker
    append semantics across micro-batches. ``timestampType=1``
    (LogAppendTime, assigned at write like a broker would).

    Scale: encode is map-only mapInPandas; the per-partition offset
    window shuffles only this batch's rows on the (bounded) partition
    key; the base-offset lookup is a tiny metadata aggregate, exactly
    the producer's metadata fetch.

    ``transactional=True`` adds exactly_once_v2 semantics: after the
    data append, the batch's per-partition offset ranges are committed
    to the ``_txn/`` sidecar (see :func:`read_committed`); a crash
    between append and commit — injectable per epoch via
    ``abort_first_attempt_epochs``, first attempt only — leaves aborted
    rows in the log that read_committed filters out, and the retried
    epoch re-appends at fresh offsets exactly like a Kafka transactional
    producer.
    """
    attempts: dict[int, int] = {}

    def write(batch_df: DataFrame, _epoch: int) -> None:
        spark = batch_df.sparkSession
        # Only a genuinely absent transcript means "first batch, offsets
        # start at 0". Any OTHER read failure (corrupt footer, transient
        # FS error) must propagate — treating it as first-batch would
        # silently restart offsets at 0 and append colliding
        # (partition, offset) rows, corrupting broker-append semantics.
        if _os.path.exists(path):
            base = transcript_end_offsets(spark, path)
        else:
            base = {}

        produced = encode_enriched(
            batch_df, schema_id, n_partitions, with_rec_id=True
        )
        w = Window.partitionBy("partition").orderBy("rec_id")
        offset = (F.row_number().over(w) - 1).cast("long")
        if base:
            base_map = F.create_map(
                *[x for p, e in base.items() for x in (F.lit(p), F.lit(e))]
            )
            offset = offset + F.coalesce(
                F.element_at(base_map, F.col("partition")), F.lit(0).cast("long")
            )
        transcript = produced.select(
            "key",
            "value",
            F.lit(topic).alias("topic"),
            "partition",
            offset.alias("offset"),
            F.current_timestamp().alias("timestamp"),
            F.lit(1).alias("timestampType"),  # LogAppendTime
        )
        transcript.write.mode("append").parquet(path)
        if not transactional:
            return
        attempts[_epoch] = attempts.get(_epoch, 0) + 1
        if _epoch in abort_first_attempt_epochs and attempts[_epoch] == 1:
            # simulated crash AFTER the data append, BEFORE the commit —
            # the aborted rows stay in the log at their offsets
            raise RuntimeError(f"injected crash before txn commit (epoch {_epoch})")
        # commit: this batch's appended ranges = (old end, new end) per
        # partition — metadata-only, no data re-read
        new_ends = transcript_end_offsets(spark, path)
        ranges = [
            (int(_epoch), p, int(base.get(p, 0)), int(end - 1))
            for p, end in new_ends.items()
            if end - 1 >= base.get(p, 0)
        ]
        if ranges:
            # local_rows, not createDataFrame(list): the list path
            # parallelizes into defaultParallelism slices and the
            # single-file coalesce(1) commit then pays every slice fetch
            # sequentially (~6 s flat for 4 rows on local[32]); the Arrow
            # single-partition relation commits in ~0.3 s.
            from ..catalog import local_rows

            local_rows(
                spark, ranges, "epoch long, part int, lo long, hi long"
            ).coalesce(1).write.mode("append").parquet(txn_ranges_path(path))

    return write


def decode_enriched_transcript(
    spark: SparkSession, path: str, committed_only: bool = False
) -> DataFrame:
    """Consume a sink transcript back into typed rows (unframe + Avro
    decode on executors) — the consumer-side check that what the sink
    'produced' is exactly the topology's output. ``committed_only``
    consumes with read_committed isolation (aborted rows filtered)."""
    from .avro_vec import decode_enriched_batch

    def decode(batches):
        # vectorized unframe + Avro decode (sources/avro_vec.py; bit-parity
        # with the AvroCodec reference pinned in tests/test_avro_vec.py)
        for b in batches:
            if b.num_rows:
                yield decode_enriched_batch(b.column("value"))

    src = (
        read_committed(spark, path)
        if committed_only
        else spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(path)
    )
    return src.select("value").mapInArrow(
        decode,
        "id long, user_id long, name string, segment string, "
        "event_type string, value double",
    )


# -- transactional produce / read-committed consume --------------------------
#
# Kafka's exactly_once_v2 story on the transcript: a transactional
# producer's data records occupy log offsets whether or not the
# transaction commits; the broker tracks committed ranges, and a
# read_committed consumer filters out aborted ones. The transcript
# mirrors exactly that: data rows append as usual, and a COMMIT writes
# this batch's per-partition offset ranges to the ``_txn/`` sidecar
# (the aborted-transaction-index analogue). A crash between the data
# append and the range commit leaves orphaned rows in the log — visible
# to read_uncommitted, invisible to read_committed — which is precisely
# Kafka's abort semantics.

def txn_ranges_path(path: str) -> str:
    return f"{path}/_txn"


def read_committed(spark: SparkSession, path: str) -> DataFrame:
    """The transcript as a read_committed consumer sees it: only rows
    whose (partition, offset) fall inside a committed range. Ranges are
    tiny metadata (rows per partition per epoch) -> broadcast semi-join,
    the same cost shape as Kafka's client-side aborted-range filter."""
    t = spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(path)
    r = spark.read.parquet(txn_ranges_path(path))
    # t["offset"], not t.offset — DataFrame.offset is the OFFSET method
    # in Spark 4 and attribute access would bind it instead of the column
    return t.join(
        F.broadcast(r),
        (t["partition"] == r["part"])
        & (t["offset"] >= r["lo"])
        & (t["offset"] <= r["hi"]),
        "left_semi",
    )
