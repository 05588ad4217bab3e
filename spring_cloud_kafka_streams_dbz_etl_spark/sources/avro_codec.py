"""Pure-Python Avro binary codec + Confluent Schema Registry wire framing.

The reference's serde is Confluent ``GenericAvroSerde`` for every key and
value (transformer/src/main/resources/application.yml:13-16): each Kafka
payload is the Confluent wire format — 1 magic byte (0x00) + 4-byte
big-endian schema id + Avro binary body — and the Debezium envelope /
output schemas live in the registry (avro/record_key.avsc,
avro/event_details.avsc, avro/animal_details.avsc;
docker/connect/register-connector.json:14-17).

This environment ships neither the spark-avro artifact (no ``from_avro``)
nor a Python avro package, so the engine carries its own minimal binary
codec implementing the Avro 1.11 spec's binary encoding (zigzag-varint
ints/longs, little-endian IEEE floats, length-prefixed bytes/strings,
union-index prefixes, block-encoded arrays/maps) for the subset of types
Debezium envelopes use: null, boolean, int, long, float, double, bytes,
string, enum, record, union, array, map, plus named-type references
(the envelope reuses its ``Value`` record for both ``before`` and
``after``).

Spark integration is Arrow-batched ``mapInPandas`` (never per-row Python
UDFs): encode/decode run on executors over pandas batches, so the hot
path scales with partition count like any other stage. When the real
spark-avro artifact is on the classpath, ``sources/streams.py::
confluent_avro_value`` is the zero-Python fast path; this module is the
fallback plus the test oracle for the wire format itself.
"""

from __future__ import annotations

import json
import struct
from typing import Any

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

CONFLUENT_MAGIC = 0x00


# -- varint / zigzag ------------------------------------------------------
def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag (Python ints are arbitrary precision)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


class AvroCodec:
    """Binary encoder/decoder for one parsed .avsc schema (JSON string or
    dict). Supports the Debezium/Confluent subset documented above."""

    def __init__(self, schema: str | dict | list) -> None:
        if isinstance(schema, str):
            schema = json.loads(schema)
        self._named: dict[str, Any] = {}
        self.schema = self._resolve(schema)

    def _resolve(self, s: Any) -> Any:
        """Normalize a schema node; register/expand named-type references."""
        if isinstance(s, str):
            if s in _PRIMITIVES:
                return s
            if s in self._named:
                return self._named[s]
            raise ValueError(f"unknown type reference {s!r}")
        if isinstance(s, list):  # union
            return [self._resolve(b) for b in s]
        if isinstance(s, dict):
            t = s["type"]
            if t in ("record", "enum", "fixed"):
                name = s["name"]
                self._named[name] = s
                ns = s.get("namespace")
                if ns:
                    self._named[f"{ns}.{name}"] = s
                if t == "record":
                    s = dict(s)
                    s["fields"] = [
                        {**f, "type": self._resolve(f["type"])} for f in s["fields"]
                    ]
                    self._named[name] = s
                    if ns:
                        self._named[f"{ns}.{name}"] = s
                return s
            if t == "array":
                return {**s, "items": self._resolve(s["items"])}
            if t == "map":
                return {**s, "values": self._resolve(s["values"])}
            if t in _PRIMITIVES:
                return t
            return self._resolve(t)
        raise ValueError(f"bad schema node: {s!r}")

    # -- encode -----------------------------------------------------------
    def encode(self, value: Any) -> bytes:
        out = bytearray()
        self._enc(self.schema, value, out)
        return bytes(out)

    def _enc(self, s: Any, v: Any, out: bytearray) -> None:
        if isinstance(s, list):  # union: index then value
            idx = self._union_branch(s, v)
            _write_long(out, idx)
            self._enc(s[idx], v, out)
            return
        t = s if isinstance(s, str) else s["type"]
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if v else 0)
        elif t in ("int", "long"):
            _write_long(out, int(v))
        elif t == "float":
            out += struct.pack("<f", float(v))
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t in ("bytes", "string"):
            raw = v.encode("utf-8") if t == "string" else bytes(v)
            _write_long(out, len(raw))
            out += raw
        elif t == "enum":
            _write_long(out, s["symbols"].index(v))
        elif t == "record":
            for f in s["fields"]:
                self._enc(f["type"], v.get(f["name"]), out)
        elif t == "array":
            if v:
                _write_long(out, len(v))
                for item in v:
                    self._enc(s["items"], item, out)
            _write_long(out, 0)
        elif t == "map":
            if v:
                _write_long(out, len(v))
                for k, item in v.items():
                    self._enc("string", k, out)
                    self._enc(s["values"], item, out)
            _write_long(out, 0)
        else:
            raise ValueError(f"cannot encode type {t!r}")

    # Python-type -> Avro-branch compatibility, used to pick the encode
    # branch of a multi-type union. bool is checked before int (bool is an
    # int subclass); where several branches match (e.g. ["int","long"]),
    # the FIRST matching branch in union order wins — standard writer
    # behavior, and round-trip-safe since the index is encoded.
    _BRANCH_OK = {
        "boolean": lambda x: isinstance(x, bool),
        "int": lambda x: isinstance(x, int) and not isinstance(x, bool),
        "long": lambda x: isinstance(x, int) and not isinstance(x, bool),
        # ints are valid float/double values (JSON-decoded payloads carry
        # `1` for 1.0; _enc coerces via float(v)) — standard Avro writers
        # accept the widening. Union order still prefers an int/long
        # branch when one exists.
        "float": lambda x: isinstance(x, (int, float)) and not isinstance(x, bool),
        "double": lambda x: isinstance(x, (int, float)) and not isinstance(x, bool),
        "string": lambda x: isinstance(x, str),
        "enum": lambda x: isinstance(x, str),
        "bytes": lambda x: isinstance(x, (bytes, bytearray)),
        "fixed": lambda x: isinstance(x, (bytes, bytearray)),
        "array": lambda x: isinstance(x, list),
        "map": lambda x: isinstance(x, dict),
        "record": lambda x: isinstance(x, dict),
    }

    @classmethod
    def _union_branch(cls, union: list, v: Any) -> int:
        """Branch index for value ``v``. Unlike the first-non-null shortcut
        this used to be, multi-type unions (["null","string","long"]) match
        on the value's Python type and unsupported shapes fail LOUDLY at
        encode time instead of silently producing corrupt bytes."""
        names = [b if isinstance(b, str) else b["type"] for b in union]
        if v is None:
            if "null" in names:
                return names.index("null")
            raise ValueError(f"None has no 'null' branch in {union!r}")
        for i, t in enumerate(names):
            if t != "null" and cls._BRANCH_OK.get(t, lambda x: False)(v):
                return i
        raise ValueError(
            f"no union branch matches {type(v).__name__} value {v!r} in {union!r}"
        )

    # -- decode -----------------------------------------------------------
    def decode(self, buf: bytes) -> Any:
        v, pos = self._dec(self.schema, buf, 0)
        if pos != len(buf):
            raise ValueError(f"trailing bytes: {len(buf) - pos}")
        return v

    def _dec(self, s: Any, buf: bytes, pos: int) -> tuple[Any, int]:
        if isinstance(s, list):
            idx, pos = _read_long(buf, pos)
            return self._dec(s[idx], buf, pos)
        t = s if isinstance(s, str) else s["type"]
        if t == "null":
            return None, pos
        if t == "boolean":
            return buf[pos] != 0, pos + 1
        if t in ("int", "long"):
            return _read_long(buf, pos)
        if t == "float":
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
        if t == "double":
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        if t in ("bytes", "string"):
            n, pos = _read_long(buf, pos)
            raw = buf[pos : pos + n]
            return (raw.decode("utf-8") if t == "string" else bytes(raw)), pos + n
        if t == "enum":
            idx, pos = _read_long(buf, pos)
            return s["symbols"][idx], pos
        if t == "record":
            rec = {}
            for f in s["fields"]:
                rec[f["name"]], pos = self._dec(f["type"], buf, pos)
            return rec, pos
        if t == "array":
            items = []
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    break
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _, pos = _read_long(buf, pos)
                for _ in range(n):
                    item, pos = self._dec(s["items"], buf, pos)
                    items.append(item)
            return items, pos
        if t == "map":
            m = {}
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    _, pos = _read_long(buf, pos)
                for _ in range(n):
                    k, pos = self._dec("string", buf, pos)
                    m[k], pos = self._dec(s["values"], buf, pos)
            return m, pos
        raise ValueError(f"cannot decode type {t!r}")


# -- Confluent wire format (magic 0x00 + 4-byte big-endian schema id) -----
def confluent_frame(schema_id: int, body: bytes) -> bytes:
    """Wrap an Avro binary body the way KafkaAvroSerializer does
    (KafkaTestHelper.java:36-49 consumes exactly this framing)."""
    return struct.pack(">bI", CONFLUENT_MAGIC, schema_id) + body


def confluent_unframe(payload: bytes) -> tuple[int, bytes]:
    """Split a Confluent-framed payload into (schema_id, avro_body);
    rejects a bad magic byte (the serde would throw, feeding the
    deserialization DLQ — application.yml:23-31)."""
    if not payload or payload[0] != CONFLUENT_MAGIC:
        raise ValueError(f"bad Confluent magic byte: {payload[:1]!r}")
    (schema_id,) = struct.unpack_from(">I", payload, 1)
    return schema_id, payload[5:]


class SchemaResolutionError(ValueError):
    """Writer and reader schemas are incompatible for a datum (missing
    field with no default, non-promotable type, unknown enum symbol)."""


def _type_name(s: Any) -> str:
    if isinstance(s, list):
        return "union"
    return s if isinstance(s, str) else s["type"]


# Avro spec type promotions (writer -> allowed readers; identity included).
_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
}


def resolve_datum(value: Any, writer: Any, reader: Any) -> Any:
    """Schema-resolution (Avro spec 'Schema Resolution') applied to a
    DECODED datum: project a value written with ``writer`` onto
    ``reader`` — reader-only record fields take their defaults,
    writer-only fields are dropped, primitive promotions apply
    (int→long→float→double, string↔bytes), union branches re-match
    against the reader union. This is how a Confluent consumer reads old
    records with its current schema; the reference gets it from
    KafkaAvroDeserializer + the registry (application.yml:13-16).

    Datum-level resolution is semantically equivalent to the spec's
    byte-level resolution for the types this codec supports, and keeps
    the decode path single-schema (decode with writer, then adapt)."""
    # unions: unwrap to the concrete schemas first
    if isinstance(writer, list):
        # the decoded value came from ONE writer branch; find the branch
        # whose shape the value matches, then resolve against the reader
        for b in writer:
            try:
                return resolve_datum(value, b, reader)
            except SchemaResolutionError:
                continue
        raise SchemaResolutionError(f"no writer branch of {writer!r} resolves to reader")
    if isinstance(reader, list):
        for b in reader:
            try:
                return resolve_datum(value, writer, b)
            except SchemaResolutionError:
                continue
        raise SchemaResolutionError(
            f"value {value!r} ({_type_name(writer)}) matches no reader branch {reader!r}"
        )

    wt, rt = _type_name(writer), _type_name(reader)
    if wt == "null":
        # a non-None value can NEVER have come from a null writer branch —
        # rejecting it here is what makes union branch-matching correct
        if value is not None:
            raise SchemaResolutionError(f"non-null value {value!r} for null writer")
        if rt != "null":
            raise SchemaResolutionError("null value for non-null reader")
        return None
    if value is None:
        raise SchemaResolutionError(f"null value for non-null writer type {wt!r}")
    # validate the VALUE's shape against the writer branch — this is what
    # lets the union loops above identify which branch a datum came from
    _shape_ok = {
        "boolean": lambda x: isinstance(x, bool),
        "int": lambda x: isinstance(x, int) and not isinstance(x, bool),
        "long": lambda x: isinstance(x, int) and not isinstance(x, bool),
        "float": lambda x: isinstance(x, (int, float)) and not isinstance(x, bool),
        "double": lambda x: isinstance(x, (int, float)) and not isinstance(x, bool),
        "string": lambda x: isinstance(x, str),
        "enum": lambda x: isinstance(x, str),
        "bytes": lambda x: isinstance(x, (bytes, bytearray)),
        "fixed": lambda x: isinstance(x, (bytes, bytearray)),
        "array": lambda x: isinstance(x, list),
        "map": lambda x: isinstance(x, dict),
        "record": lambda x: isinstance(x, dict),
    }
    if wt in _shape_ok and not _shape_ok[wt](value):
        raise SchemaResolutionError(
            f"value {value!r} does not match writer type {wt!r}"
        )
    if wt in _PROMOTIONS:
        if rt not in _PROMOTIONS[wt]:
            raise SchemaResolutionError(f"cannot promote {wt} -> {rt}")
        if rt in ("float", "double"):
            return float(value)
        if wt == "string" and rt == "bytes":
            return value.encode() if isinstance(value, str) else value
        if wt == "bytes" and rt == "string":
            try:
                return (
                    bytes(value).decode() if isinstance(value, (bytes, bytearray)) else value
                )
            except UnicodeDecodeError as exc:
                # non-UTF8 bytes cannot promote to string — keep the
                # failure inside the SchemaResolutionError -> DLQ contract
                raise SchemaResolutionError(f"bytes not UTF-8 decodable: {exc}") from exc
        return value
    if wt != rt:
        raise SchemaResolutionError(f"incompatible types {wt} -> {rt}")
    if wt == "boolean":
        return value
    if wt == "enum":
        if value not in reader["symbols"]:
            raise SchemaResolutionError(f"enum symbol {value!r} unknown to reader")
        return value
    if wt == "fixed":
        return value
    if wt == "array":
        return [resolve_datum(v, writer["items"], reader["items"]) for v in value]
    if wt == "map":
        return {
            k: resolve_datum(v, writer["values"], reader["values"])
            for k, v in value.items()
        }
    if wt == "record":
        writer_fields = {f["name"]: f for f in writer["fields"]}
        out = {}
        for rf in reader["fields"]:
            name = rf["name"]
            if name in writer_fields:
                out[name] = resolve_datum(
                    value.get(name), writer_fields[name]["type"], rf["type"]
                )
            elif "default" in rf:
                out[name] = rf["default"]
            else:
                raise SchemaResolutionError(
                    f"reader field {name!r} absent from writer and has no default"
                )
        return out  # writer-only fields dropped
    raise SchemaResolutionError(f"unsupported resolution type {wt!r}")


class SchemaNotFoundError(LookupError):
    """Unknown schema id — the deserialization failure the reference's
    serde config routes to the DLQ (enable-dlq + deserialization handler,
    application.yml:23-31) rather than crashing the stream."""


class SchemaRegistry:
    """In-memory Confluent-registry semantics (the reference resolves
    writer schemas by id over HTTP, application.yml:16): id<->schema map
    with sequential id assignment, idempotent re-registration of an
    identical schema string, and codec caching per id.

    Executor use: the registry dict is tiny (schemas, not data) — ship it
    into mapInPandas closures whole; decode resolves the WRITER schema
    from each record's frame, so mixed-schema topics decode correctly and
    unknown ids fail as SchemaNotFoundError for the caller's DLQ split.
    """

    def __init__(self) -> None:
        self._by_id: dict[int, str] = {}
        self._id_by_schema: dict[str, int] = {}
        self._codecs: dict[int, AvroCodec] = {}
        self._readers: dict[str, Any] = {}  # parsed reader schemas by json
        self._subjects: dict[str, list[int]] = {}
        self._next_id = 1

    def register(self, schema_json: str, subject: str | None = None) -> int:
        """Assign (or return the existing) id for a schema string; with
        ``subject``, also append it to the subject's version list (the
        Confluent subject model — one subject per topic-value, versions in
        registration order)."""
        if schema_json in self._id_by_schema:
            sid = self._id_by_schema[schema_json]
        else:
            sid = self._next_id
            self._next_id += 1
            self._by_id[sid] = schema_json
            self._id_by_schema[schema_json] = sid
        if subject is not None:
            versions = self._subjects.setdefault(subject, [])
            if sid not in versions:
                versions.append(sid)
        return sid

    def subject_versions(self, subject: str) -> list[int]:
        """Schema ids registered under ``subject``, oldest first."""
        if subject not in self._subjects:
            raise SchemaNotFoundError(f"subject {subject!r} not registered")
        return list(self._subjects[subject])

    def latest_for_subject(self, subject: str) -> tuple[int, str]:
        sid = self.subject_versions(subject)[-1]
        return sid, self._by_id[sid]

    def schema_for(self, schema_id: int) -> str:
        if schema_id not in self._by_id:
            raise SchemaNotFoundError(f"schema id {schema_id} not registered")
        return self._by_id[schema_id]

    def codec_for(self, schema_id: int) -> AvroCodec:
        if schema_id not in self._codecs:
            self._codecs[schema_id] = AvroCodec(self.schema_for(schema_id))
        return self._codecs[schema_id]

    # -- framed serde (KafkaAvroSerializer twins) -------------------------
    def encode_framed(self, schema_id: int, value) -> bytes:
        return confluent_frame(schema_id, self.codec_for(schema_id).encode(value))

    def decode_framed(self, payload: bytes):
        """(schema_id, decoded value); raises ValueError on bad framing and
        SchemaNotFoundError on an unregistered id — both are DLQ-routable
        deserialization failures."""
        sid, body = confluent_unframe(payload)
        return sid, self.codec_for(sid).decode(body)

    def decode_framed_as(self, payload: bytes, reader_schema_json: str):
        """Confluent-consumer semantics: decode with the record's WRITER
        schema (resolved by framed id), then schema-resolve onto the
        caller's READER schema — old records gain new fields' defaults,
        removed fields drop, promoted types widen. Raises
        SchemaResolutionError (DLQ-routable) on incompatibility.

        The parsed reader schema is cached per schema string — this is
        the per-record consumer path and must not re-parse JSON per call.
        """
        sid, value = self.decode_framed(payload)
        if reader_schema_json not in self._readers:
            self._readers[reader_schema_json] = AvroCodec(reader_schema_json).schema
        writer = self.codec_for(sid).schema
        return sid, resolve_datum(value, writer, self._readers[reader_schema_json])


class HttpSchemaRegistry(SchemaRegistry):
    """Confluent Schema Registry REST client with the same interface as
    the in-memory :class:`SchemaRegistry` (VERDICT r04 next-round #7).

    Speaks the public wire protocol the reference's serdes use
    (application.yml:16 / register-connector.json:14-17):

    - ``POST {base}/subjects/{subject}/versions`` body
      ``{"schema": "<avsc json>"}`` -> ``{"id": N}``
    - ``GET {base}/schemas/ids/{id}`` -> ``{"schema": ...}``
    - ``GET {base}/subjects/{subject}/versions/latest`` ->
      ``{"id", "version", "schema"}``

    Every response populates the inherited in-memory cache, so repeat
    lookups (the per-record decode path) never re-hit HTTP, and
    :meth:`snapshot` returns a plain picklable ``SchemaRegistry`` of the
    cached schemas for shipping into mapInPandas closures — executors
    must never block on a control-plane HTTP call. HTTP 404 maps to
    ``SchemaNotFoundError`` (the DLQ-routable miss); other HTTP errors
    raise. Falls back to pure in-memory behavior when ``base_url`` is
    None, so callers can hold one type either way.
    """

    def __init__(self, base_url: str | None = None, timeout: float = 5.0) -> None:
        super().__init__()
        self._base = base_url.rstrip("/") if base_url else None
        self._timeout = timeout

    # -- wire helpers ------------------------------------------------------
    def _http(self, method: str, path: str, body: dict | None = None) -> dict:
        import urllib.error
        import urllib.request

        assert self._base is not None
        data = None if body is None else json.dumps(body).encode()
        req = urllib.request.Request(
            f"{self._base}{path}",
            data=data,
            method=method,
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as exc:
            detail = exc.read().decode(errors="replace")
            if exc.code == 404:
                raise SchemaNotFoundError(f"registry 404 on {path}: {detail}")
            raise OSError(f"registry HTTP {exc.code} on {path}: {detail}")

    def _cache_remote(self, sid: int, schema_json: str) -> None:
        self._by_id[sid] = schema_json
        self._id_by_schema[schema_json] = sid

    # -- SchemaRegistry interface over the wire ----------------------------
    def register(self, schema_json: str, subject: str | None = None) -> int:
        if self._base is None:
            return super().register(schema_json, subject)
        sid = int(
            self._http(
                "POST",
                f"/subjects/{subject or 'default'}/versions",
                {"schema": schema_json},
            )["id"]
        )
        self._cache_remote(sid, schema_json)
        if subject is not None:
            versions = self._subjects.setdefault(subject, [])
            if sid not in versions:
                versions.append(sid)
        return sid

    def schema_for(self, schema_id: int) -> str:
        if self._base is not None and schema_id not in self._by_id:
            self._cache_remote(
                schema_id,
                self._http("GET", f"/schemas/ids/{schema_id}")["schema"],
            )
        return super().schema_for(schema_id)

    def latest_for_subject(self, subject: str) -> tuple[int, str]:
        if self._base is None:
            return super().latest_for_subject(subject)
        out = self._http("GET", f"/subjects/{subject}/versions/latest")
        sid, schema = int(out["id"]), out["schema"]
        self._cache_remote(sid, schema)
        versions = self._subjects.setdefault(subject, [])
        if sid not in versions:
            versions.append(sid)
        return sid, schema

    def subject_versions(self, subject: str) -> list[int]:
        if self._base is not None and subject not in self._subjects:
            # prime the cache with at least the latest version
            self.latest_for_subject(subject)
        return super().subject_versions(subject)

    def snapshot(self) -> SchemaRegistry:
        """Picklable in-memory copy of everything cached so far, for
        executor closures (decode resolves writer ids locally; an id the
        snapshot has never seen raises SchemaNotFoundError -> DLQ, same
        as a registry miss)."""
        reg = SchemaRegistry()
        for sid, schema in sorted(self._by_id.items()):
            reg._by_id[sid] = schema
            reg._id_by_schema[schema] = sid
        for subject, versions in self._subjects.items():
            reg._subjects[subject] = list(versions)
        reg._next_id = max(self._by_id, default=0) + 1
        return reg


# -- Debezium envelope schema for the engine's events table ---------------
# Shape-parity with the reference's CDC value schema: before/after reuse
# one named record, plus source/op/ts_ms (SURVEY.md §1.1 item 3;
# integration tests navigate value.getSchema().getField("after") —
# KafkaTestHelper.java:89-101).
EVENTS_ENVELOPE_AVSC = json.dumps(
    {
        "type": "record",
        "name": "Envelope",
        "namespace": "dbserver1.public.events",
        "fields": [
            {
                "name": "before",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "Value",
                        "fields": [
                            {"name": "id", "type": "long"},
                            {"name": "user_id", "type": "long"},
                            {"name": "event_type", "type": ["null", "string"]},
                            {"name": "value", "type": ["null", "double"]},
                        ],
                    },
                ],
            },
            {"name": "after", "type": ["null", "Value"]},
            {
                "name": "source",
                "type": {
                    "type": "record",
                    "name": "Source",
                    "fields": [
                        {"name": "table", "type": "string"},
                        {"name": "lsn", "type": "long"},
                    ],
                },
            },
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": ["null", "long"]},
        ],
    }
)
