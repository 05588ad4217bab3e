"""Engine schemas: Debezium CDC envelope + enriched output records.

Mirrors the reference's data shapes (FIXTURES.md §A):
- the Debezium change envelope (before/after/source/op/ts_ms) consumed
  generically at ``transformer/.../stream/EventTransformerStream.java:42-59``
  and ``service/AnimalEnrichmentService.java:38-54`` of the reference;
- flat output records ``RecordKey`` / ``EventDetails`` / ``AnimalDetails``
  (``avro/record_key.avsc``, ``avro/event_details.avsc``,
  ``avro/animal_details.avsc``).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _entity_struct(with_breed: bool = True) -> T.StructType:
    fields = [
        T.StructField("id", T.LongType(), True),
        T.StructField("version", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
    ]
    if with_breed:
        fields.append(T.StructField("breed", T.StringType(), True))
    return T.StructType(fields)


def cdc_envelope_schema(with_breed: bool = True) -> T.StructType:
    """Debezium 2.4-style change envelope (Avro -> Spark struct)."""
    entity = _entity_struct(with_breed)
    source = T.StructType(
        [
            T.StructField("version", T.StringType(), True),
            T.StructField("connector", T.StringType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("db", T.StringType(), True),
            T.StructField("schema", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("lsn", T.LongType(), True),
        ]
    )
    return T.StructType(
        [
            T.StructField("before", entity, True),
            T.StructField("after", entity, True),
            T.StructField("source", source, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


# Synthetic envelope carried over the driver's `events` table (the stand-in
# CDC stream, FIXTURES.md §C): after = {id, user_id, event_type, value}.
def events_envelope_schema() -> T.StructType:
    after = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    return T.StructType(
        [
            T.StructField("before", after, True),
            T.StructField("after", after, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


RECORD_KEY = T.StructType([T.StructField("id", T.LongType(), False)])

EVENT_DETAILS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

ANIMAL_DETAILS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("breed", T.StringType(), False),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)
