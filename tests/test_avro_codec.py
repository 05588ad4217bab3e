"""Avro binary codec + Confluent wire-format tests.

The byte fixtures are hand-derived from the Avro 1.11 spec's binary
encoding section, so they pin spec compliance — not just encode/decode
symmetry (a self-roundtrip would pass even if both sides shared a bug).
Mirrors the reference's serde configuration (GenericAvroSerde,
application.yml:13-16) and the consumer in KafkaTestHelper.java:36-49.
"""

from __future__ import annotations

import json

import pytest

from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
    EVENTS_ENVELOPE_AVSC,
    AvroCodec,
    confluent_frame,
    confluent_unframe,
)


def codec(schema):
    return AvroCodec(json.dumps(schema))  # always JSON text, like an .avsc file


# -- spec byte fixtures ---------------------------------------------------
@pytest.mark.parametrize(
    "schema,value,expected",
    [
        ("long", 0, b"\x00"),
        ("long", -1, b"\x01"),
        ("long", 1, b"\x02"),
        ("long", -64, b"\x7f"),
        ("long", 64, b"\x80\x01"),  # spec's varint example boundary
        ("int", 3, b"\x06"),
        ("string", "foo", b"\x06foo"),
        ("bytes", b"\x01\x02", b"\x04\x01\x02"),
        ("boolean", True, b"\x01"),
        ("double", 1.0, b"\x00\x00\x00\x00\x00\x00\xf0\x3f"),
        ("float", 1.0, b"\x00\x00\x80\x3f"),
    ],
)
def test_primitive_spec_bytes(schema, value, expected):
    c = codec(schema)
    assert c.encode(value) == expected
    assert c.decode(expected) == value


def test_union_spec_bytes():
    # spec example: union ["null","string"]; null -> 0x00; "a" -> 0x02 0x02 a
    c = codec(["null", "string"])
    assert c.encode(None) == b"\x00"
    assert c.encode("a") == b"\x02\x02a"
    assert c.decode(b"\x02\x02a") == "a"
    assert c.decode(b"\x00") is None


def test_record_spec_bytes():
    # spec's example record {a: long, b: string} with {27, "foo"}
    # -> 0x36 0x06 f o o
    c = codec(
        {
            "type": "record",
            "name": "test",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "string"},
            ],
        }
    )
    assert c.encode({"a": 27, "b": "foo"}) == b"\x36\x06foo"
    assert c.decode(b"\x36\x06foo") == {"a": 27, "b": "foo"}


def test_array_spec_bytes():
    # spec's example: array<long> [3, 27] -> 0x04 0x06 0x36 0x00
    c = codec({"type": "array", "items": "long"})
    assert c.encode([3, 27]) == b"\x04\x06\x36\x00"
    assert c.decode(b"\x04\x06\x36\x00") == [3, 27]
    # negative block count (size-prefixed block) also decodes
    assert c.decode(b"\x03\x04\x06\x36\x00") == [3, 27]


def test_map_enum_roundtrip():
    c = codec({"type": "map", "values": "int"})
    assert c.decode(c.encode({"x": 1, "y": -2})) == {"x": 1, "y": -2}
    e = codec({"type": "enum", "name": "Op", "symbols": ["c", "u", "d"]})
    assert e.encode("u") == b"\x02"
    assert e.decode(b"\x04") == "d"


def test_envelope_named_type_reuse_roundtrip():
    """before/after reference the same named record ('Value') — the shape
    Debezium registers (SURVEY.md §1.1 item 3)."""
    c = AvroCodec(EVENTS_ENVELOPE_AVSC)
    env = {
        "before": {"id": 1, "user_id": 2, "event_type": "click", "value": 1.5},
        "after": {"id": 1, "user_id": 2, "event_type": None, "value": None},
        "source": {"table": "events", "lsn": 123456789},
        "op": "u",
        "ts_ms": 1700000000123,
    }
    assert c.decode(c.encode(env)) == env


def test_confluent_framing():
    framed = confluent_frame(42, b"\x36\x06foo")
    assert framed[:5] == b"\x00\x00\x00\x00\x2a"  # magic + big-endian id
    sid, body = confluent_unframe(framed)
    assert sid == 42 and body == b"\x36\x06foo"


def test_confluent_bad_magic_rejected():
    # a non-Avro payload must fail loudly -> deserialization-DLQ path
    # (enable-dlq, application.yml:23-31)
    with pytest.raises(ValueError):
        confluent_unframe(b"\x01\x00\x00\x00\x2a")
    with pytest.raises(ValueError):
        confluent_unframe(b"")


def test_unknown_type_reference_rejected():
    with pytest.raises(ValueError):
        codec({"type": "record", "name": "r", "fields": [{"name": "x", "type": "Nope"}]})


def test_multi_branch_union_matches_value_type():
    """ADVICE r02: ["null","string","long"] used to encode EVERY non-null
    value against the string branch, silently corrupting longs. Branch
    selection now matches the value's Python type."""
    c = codec(["null", "string", "long"])
    for v in (None, "a", 27, -3):
        assert c.decode(c.encode(v)) == v
    # long 27 -> branch index 2 (zigzag 0x04), then zigzag(27)=0x36
    assert c.encode(27) == b"\x04\x36"
    assert c.encode("a") == b"\x02\x02a"
    # bool is NOT an int for branch matching; no boolean branch -> loud error
    with pytest.raises(ValueError):
        c.encode(True)


def test_union_no_matching_branch_fails_loudly():
    c = codec(["null", "string"])
    with pytest.raises(ValueError):
        c.encode(12)  # no int-compatible branch
    with pytest.raises(ValueError):
        codec(["string", "long"]).encode(None)  # no null branch


def test_schema_registry_roundtrip_and_unknown_id():
    """VERDICT r03 item 7: id<->schema map; an unknown id is a
    DLQ-routable SchemaNotFoundError, not a crash or silent misdecode."""
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        SchemaNotFoundError,
        SchemaRegistry,
    )

    reg = SchemaRegistry()
    sid = reg.register('"string"')
    assert reg.register('"string"') == sid  # idempotent re-registration
    sid2 = reg.register('"long"')
    assert sid2 != sid

    framed = reg.encode_framed(sid, "hi")
    got_sid, value = reg.decode_framed(framed)
    assert (got_sid, value) == (sid, "hi")
    # a different registered writer schema resolves correctly (mixed topic)
    assert reg.decode_framed(reg.encode_framed(sid2, 27)) == (sid2, 27)

    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        confluent_frame,
    )

    with pytest.raises(SchemaNotFoundError):
        reg.decode_framed(confluent_frame(99, b"\x04hi"))
    with pytest.raises(ValueError):
        reg.decode_framed(b"\x01bad-magic")


def test_union_numeric_widening_int_for_double():
    """Review finding r03: JSON-decoded payloads carry int 1 for double
    fields; the typed branch matcher must accept the standard widening."""
    c = codec(["null", "double"])
    assert c.decode(c.encode(1)) == 1.0
    assert c.encode(1) == c.encode(1.0)
    # int/long branch still wins when present (union order)
    c2 = codec(["null", "long", "double"])
    assert c2.encode(27)[0:1] == b"\x02"  # branch index 1 = long
    # bool still never matches a numeric branch
    with pytest.raises(ValueError):
        c.encode(True)


# -- schema evolution (Avro spec "Schema Resolution") -----------------------

_V1 = {
    "type": "record", "name": "Ev", "fields": [
        {"name": "id", "type": "int"},
        {"name": "name", "type": "string"},
        {"name": "legacy", "type": "string"},
    ],
}
_V2 = {
    "type": "record", "name": "Ev", "fields": [
        {"name": "id", "type": "long"},              # int -> long promotion
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double", "default": 0.0},  # added w/ default
        {"name": "tag", "type": ["null", "string"], "default": None},
    ],
}


def test_schema_evolution_old_record_new_reader():
    """A v1-written record read with the v2 schema: promoted id, defaults
    for added fields, removed field dropped — Confluent-consumer behavior."""
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        SchemaRegistry,
    )

    reg = SchemaRegistry()
    v1_id = reg.register(json.dumps(_V1))
    payload = reg.encode_framed(v1_id, {"id": 7, "name": "a", "legacy": "x"})
    sid, value = reg.decode_framed_as(payload, json.dumps(_V2))
    assert sid == v1_id
    assert value == {"id": 7, "name": "a", "score": 0.0, "tag": None}


def test_schema_evolution_mixed_topic_resolves_per_record():
    """v1 and v2 writers on one topic, one v2 reader — each record
    resolves against ITS writer schema by framed id."""
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        SchemaRegistry,
    )

    reg = SchemaRegistry()
    v1_id = reg.register(json.dumps(_V1))
    v2_id = reg.register(json.dumps(_V2))
    p1 = reg.encode_framed(v1_id, {"id": 1, "name": "old", "legacy": "x"})
    p2 = reg.encode_framed(v2_id, {"id": 2, "name": "new", "score": 1.5, "tag": "t"})
    out = [reg.decode_framed_as(p, json.dumps(_V2))[1] for p in (p1, p2)]
    assert out == [
        {"id": 1, "name": "old", "score": 0.0, "tag": None},
        {"id": 2, "name": "new", "score": 1.5, "tag": "t"},
    ]


def test_schema_evolution_incompatible_raises():
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        SchemaRegistry,
        SchemaResolutionError,
    )

    reg = SchemaRegistry()
    v1_id = reg.register(json.dumps(_V1))
    payload = reg.encode_framed(v1_id, {"id": 7, "name": "a", "legacy": "x"})
    # reader adds a field WITHOUT a default -> must fail loudly (DLQ route)
    bad = {
        "type": "record", "name": "Ev", "fields": [
            {"name": "id", "type": "long"},
            {"name": "required_new", "type": "string"},
        ],
    }
    with pytest.raises(SchemaResolutionError):
        reg.decode_framed_as(payload, json.dumps(bad))
    # narrowing promotion (int reader for string writer field) also fails
    narrow = {
        "type": "record", "name": "Ev", "fields": [
            {"name": "id", "type": "int"},
            {"name": "name", "type": "int"},
        ],
    }
    with pytest.raises(SchemaResolutionError):
        reg.decode_framed_as(payload, json.dumps(narrow))


def test_schema_evolution_nested_and_enum():
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        SchemaRegistry,
        SchemaResolutionError,
    )

    w = {
        "type": "record", "name": "N", "fields": [
            {"name": "xs", "type": {"type": "array", "items": "int"}},
            {"name": "op", "type": {"type": "enum", "name": "Op", "symbols": ["c", "u", "d"]}},
        ],
    }
    r_ok = {
        "type": "record", "name": "N", "fields": [
            {"name": "xs", "type": {"type": "array", "items": "double"}},
            {"name": "op", "type": {"type": "enum", "name": "Op", "symbols": ["c", "u", "d", "r"]}},
        ],
    }
    r_enum_missing = {
        "type": "record", "name": "N", "fields": [
            {"name": "xs", "type": {"type": "array", "items": "long"}},
            {"name": "op", "type": {"type": "enum", "name": "Op", "symbols": ["c"]}},
        ],
    }
    reg = SchemaRegistry()
    wid = reg.register(json.dumps(w))
    payload = reg.encode_framed(wid, {"xs": [1, 2], "op": "u"})
    _, v = reg.decode_framed_as(payload, json.dumps(r_ok))
    assert v == {"xs": [1.0, 2.0], "op": "u"}
    with pytest.raises(SchemaResolutionError):
        reg.decode_framed_as(payload, json.dumps(r_enum_missing))


def test_bytes_to_string_promotion_non_utf8_is_resolution_error():
    """Review r03: non-UTF8 bytes promoting to string must stay inside the
    SchemaResolutionError -> DLQ contract, not leak UnicodeDecodeError."""
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        SchemaRegistry,
        SchemaResolutionError,
    )

    w = {"type": "record", "name": "B", "fields": [{"name": "x", "type": "bytes"}]}
    r = {"type": "record", "name": "B", "fields": [{"name": "x", "type": "string"}]}
    reg = SchemaRegistry()
    wid = reg.register(json.dumps(w))
    ok = reg.encode_framed(wid, {"x": b"hi"})
    assert reg.decode_framed_as(ok, json.dumps(r))[1] == {"x": "hi"}
    bad = reg.encode_framed(wid, {"x": b"\xff\xfe"})
    with pytest.raises(SchemaResolutionError):
        reg.decode_framed_as(bad, json.dumps(r))


# -- HTTP schema-registry client (Confluent wire protocol) ------------------


@pytest.fixture()
def http_registry():
    """A Confluent-shaped registry server (the facade's standard-path
    routes over an in-memory SchemaRegistry) + an HttpSchemaRegistry
    client pointed at it."""
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        HttpSchemaRegistry,
        SchemaRegistry,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.streaming.http_facade import (
        StreamControlHttp,
    )

    server_reg = SchemaRegistry()
    srv = StreamControlHttp(object(), schema_registry=server_reg)
    port = srv.start()
    client = HttpSchemaRegistry(f"http://127.0.0.1:{port}")
    yield server_reg, client
    srv.stop()


def test_http_registry_register_and_resolve(http_registry):
    """Register over POST /subjects/{s}/versions, resolve over
    GET /schemas/ids/{id} and /subjects/{s}/versions/latest — same
    interface as the in-memory registry, over the public wire protocol."""
    server_reg, client = http_registry
    sid = client.register(json.dumps(_V1), subject="events-value")
    assert server_reg.schema_for(sid) == json.dumps(_V1)  # landed server-side
    # a second client discovers the schema purely over HTTP
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        HttpSchemaRegistry,
    )

    other = HttpSchemaRegistry(client._base)
    assert other.schema_for(sid) == json.dumps(_V1)
    got_sid, schema = other.latest_for_subject("events-value")
    assert (got_sid, schema) == (sid, json.dumps(_V1))
    # idempotent re-registration returns the same id
    assert client.register(json.dumps(_V1), subject="events-value") == sid


def test_http_registry_unknown_id_is_dlq_routable(http_registry):
    """An id the server has never seen -> HTTP 404 -> SchemaNotFoundError
    (the DLQ split's routing condition), through the HTTP path."""
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        SchemaNotFoundError,
        confluent_frame,
    )

    _, client = http_registry
    with pytest.raises(SchemaNotFoundError):
        client.schema_for(12345)
    with pytest.raises(SchemaNotFoundError):
        client.decode_framed(confluent_frame(12345, b"\x04hi"))
    with pytest.raises(SchemaNotFoundError):
        client.latest_for_subject("never-registered")


def test_http_registry_writer_resolution_through_http(http_registry):
    """The mixed-topic evolution test through the HTTP path: v1/v2
    writers registered over the wire, a FRESH client resolves each
    record against its writer schema by framed id and reads with v2."""
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        HttpSchemaRegistry,
    )

    _, client = http_registry
    v1_id = client.register(json.dumps(_V1), subject="ev-value")
    v2_id = client.register(json.dumps(_V2), subject="ev-value")
    p1 = client.encode_framed(v1_id, {"id": 1, "name": "old", "legacy": "x"})
    p2 = client.encode_framed(v2_id, {"id": 2, "name": "new", "score": 1.5, "tag": "t"})
    reader = HttpSchemaRegistry(client._base)  # resolves ids over HTTP
    out = [reader.decode_framed_as(p, json.dumps(_V2))[1] for p in (p1, p2)]
    assert out == [
        {"id": 1, "name": "old", "score": 0.0, "tag": None},
        {"id": 2, "name": "new", "score": 1.5, "tag": "t"},
    ]


def test_http_registry_snapshot_is_offline(http_registry):
    """snapshot() yields a plain in-memory registry for executor
    closures: cached ids decode with no live server; uncached ids raise
    SchemaNotFoundError instead of attempting HTTP."""
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        SchemaNotFoundError,
        SchemaRegistry,
        confluent_frame,
    )

    _, client = http_registry
    sid = client.register(json.dumps(_V1), subject="snap-value")
    payload = client.encode_framed(sid, {"id": 9, "name": "n", "legacy": "z"})
    snap = client.snapshot()
    assert type(snap) is SchemaRegistry
    got_sid, value = snap.decode_framed(payload)
    assert (got_sid, value["id"]) == (sid, 9)
    import pickle

    snap2 = pickle.loads(pickle.dumps(snap))  # closure-shippable
    assert snap2.decode_framed(payload)[0] == sid
    with pytest.raises(SchemaNotFoundError):
        snap.decode_framed(confluent_frame(sid + 1000, b"\x00"))


def test_http_registry_offline_fallback():
    """base_url=None degrades to pure in-memory behavior (one type for
    both deployments)."""
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.avro_codec import (
        HttpSchemaRegistry,
    )

    reg = HttpSchemaRegistry(None)
    sid = reg.register('"string"', subject="s-value")
    assert reg.schema_for(sid) == '"string"'
    assert reg.latest_for_subject("s-value") == (sid, '"string"')
