"""Optional HTTP control plane over StreamRegistry.

The reference exposes stream lifecycle/offset control as REST on the
transformer app (AnimalStreamController.java:46-184: status, offsets,
start/stop, reset earliest/latest/specific; DLQ start/stop on
AnimalDlqTransformerStream.java:39-66). The engine's Python API
(streaming/registry.py) is the semantic surface; this facade is a thin
stdlib shell over it for HTTP parity — same routes, same response
fields, 404 for unknown streams and 409 for failed resets
(AnimalStreamController.java:211) — so a user of the reference's
endpoints can point the same calls here (MIGRATION.md maps each one).

Deliberately not a web framework: one ThreadingHTTPServer, regex routes,
JSON bodies. The control plane is low-QPS by construction (a handful of
lifecycle calls), so stdlib is the right dependency footprint.
"""

from __future__ import annotations

import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from .registry import UnknownStreamError

_ROUTES = [
    ("GET", re.compile(r"^/api/stream/([^/]+)/status$"), "status"),
    ("GET", re.compile(r"^/api/stream/([^/]+)/offsets$"), "offsets"),
    ("GET", re.compile(r"^/api/stream/([^/]+)/metrics$"), "metrics"),
    ("POST", re.compile(r"^/api/stream/([^/]+)/start$"), "start"),
    ("POST", re.compile(r"^/api/stream/([^/]+)/stop$"), "stop"),
    ("POST", re.compile(r"^/api/stream/([^/]+)/offsets/reset/earliest$"), "reset_earliest"),
    ("POST", re.compile(r"^/api/stream/([^/]+)/offsets/reset/latest$"), "reset_latest"),
    ("POST", re.compile(r"^/api/stream/([^/]+)/offsets/reset$"), "reset_specific"),
    # DLQ stream lifecycle (AnimalDlqTransformerStream.java:51-65) — the
    # DLQ reprocess stream is just a named stream here
    ("POST", re.compile(r"^/api/dlq/([^/]+)/start$"), "start"),
    ("POST", re.compile(r"^/api/dlq/([^/]+)/stop$"), "stop"),
    # Manual export bypassing CDC (ManualAnimalExportController.java:46-77):
    # body is an entity or change envelope (after -> root fallback); the
    # reference returns 200 with the produced record, 422 when enrichment
    # fails; a missing/zero id is the caller's error -> 400.
    ("POST", re.compile(r"^/api/export/([^/]+)$"), "export"),
    # Schema-registry REST subset (the reference points its serdes at a
    # Confluent registry, application.yml:16; these are the three routes
    # its consumers/producers actually hit):
    # Both the facade-prefixed and the STANDARD Confluent paths are
    # served, so sources.avro_codec.HttpSchemaRegistry (and any real
    # Confluent client) can point here with no path rewriting:
    ("GET", re.compile(r"^(?:/api)?/schemas/ids/([0-9]+)$"), "schema_by_id"),
    ("POST", re.compile(r"^(?:/api)?/subjects/([^/]+)/versions$"), "schema_register"),
    ("GET", re.compile(r"^(?:/api)?/subjects/([^/]+)/versions/latest$"), "schema_latest"),
    # Liveness probe — the compose healthchecks curl a functional route
    # (docker-compose.yml: app polls /api/events, connect /connectors);
    # one cheap endpoint reports process + per-stream state for the same
    # orchestration pattern:
    ("GET", re.compile(r"^/health$"), "health"),
    # Dimension CRUD (AnimalController.java:27-63 GET/POST/PUT/DELETE
    # /api/animals/{id}); writes land as new immutable dim versions the
    # stream's next micro-batch enriches against:
    ("GET", re.compile(r"^/api/dim/([^/]+)/([^/]+)$"), "dim_get"),
    ("POST", re.compile(r"^/api/dim/([^/]+)$"), "dim_upsert"),
    ("PUT", re.compile(r"^/api/dim/([^/]+)/([^/]+)$"), "dim_put"),
    ("DELETE", re.compile(r"^/api/dim/([^/]+)/([^/]+)$"), "dim_delete"),
]


class StreamControlHttp:
    """Serve a StreamRegistry over HTTP. ``port=0`` binds an ephemeral
    port (returned by start())."""

    def __init__(
        self,
        registry: Any,
        host: str = "127.0.0.1",
        port: int = 0,
        exporter: Any = None,
        schema_registry: Any = None,
        dim_store: Any = None,
    ) -> None:
        """``exporter``: optional callable (entity_name, body_dict) -> row
        dict, wired to ``streaming.export.make_exporter``. Raise LookupError
        for an unknown entity (-> 404), ValueError for a bad payload
        (-> 400); other failures map to 422 like the reference.

        ``schema_registry``: optional ``sources.avro_codec.SchemaRegistry``
        served on the Confluent-shaped /api/schemas + /api/subjects routes.

        ``dim_store``: optional ``streaming.dimstore.DimStore`` served on
        the /api/dim CRUD routes (AnimalController parity).
        """
        self._registry = registry
        self._host = host
        self._port = port
        self._exporter = exporter
        self._schema_registry = schema_registry
        self._dim_store = dim_store
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- lifecycle --------------------------------------------------------
    def start(self) -> int:
        registry = self._registry
        exporter = self._exporter
        schema_registry = self._schema_registry
        dim_store = self._dim_store

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _dispatch(self, method: str) -> None:
                for m, rx, action in _ROUTES:
                    if m != method:
                        continue
                    match = rx.match(self.path)
                    if not match:
                        continue
                    name = match.group(1) if match.re.groups >= 1 else None
                    if action == "export":
                        self._send(*_export(exporter, name, self._body()))
                        return
                    if action.startswith("schema_"):
                        self._send(
                            *_schema_route(schema_registry, action, name, self._body())
                        )
                        return
                    if action == "health":
                        self._send(*_health(registry))
                        return
                    if action.startswith("dim_"):
                        key = match.group(2) if match.re.groups > 1 else None
                        self._send(
                            *_dim_route(dim_store, action, name, key, self._body())
                        )
                        return
                    try:
                        self._send(*_invoke(registry, action, name, self._body()))
                    except UnknownStreamError:
                        self._send(404, {"error": f"unknown stream {name!r}"})
                    except Exception as exc:  # reset/lifecycle failure
                        self._send(409, {"error": str(exc)})
                    return
                self._send(404, {"error": f"no route {method} {self.path}"})

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                if not n:
                    return {}
                try:
                    return json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    return {}

            def do_GET(self):
                self._dispatch("GET")

            def do_POST(self):
                self._dispatch("POST")

            def do_PUT(self):
                self._dispatch("PUT")

            def do_DELETE(self):
                self._dispatch("DELETE")

        self._server = ThreadingHTTPServer((self._host, self._port), Handler)
        self._port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


def _invoke(registry: Any, action: str, name: str, body: dict) -> tuple[int, dict]:
    """Map a route action onto the registry API; response fields mirror the
    reference DTOs (StreamStatusResponse.java:1-10 carries a timestamp)."""
    stamp = {"timestamp": time.time()}
    if action == "status":
        return 200, {**registry.status(name), **stamp}
    if action == "offsets":
        return 200, {**registry.offsets(name), **stamp}
    if action == "metrics":
        return 200, {**registry.metrics(name), **stamp}
    if action in ("start", "stop"):
        return 200, {**getattr(registry, action)(name), **stamp}
    if action == "reset_earliest":
        return 200, {**registry.reset_offsets(name, "earliest"), **stamp}
    if action == "reset_latest":
        return 200, {**registry.reset_offsets(name, "latest"), **stamp}
    if action == "reset_specific":
        batch = body.get("batch")
        # Strict ASCII integer shape — lstrip('-').isdigit() would admit
        # "--7" and Unicode digits that int() then rejects, escaping as
        # 409 (the exact class ADVICE r02 flagged).
        if isinstance(batch, str) and re.fullmatch(r"-?[0-9]+", batch):
            batch = int(batch)
        if not isinstance(batch, int) or isinstance(batch, bool):
            # malformed body is the CALLER's error -> 400, never the
            # generic 409 (ADVICE r02: int("x") used to escape as 409)
            return 400, {"error": "body must carry {'batch': <int>}"}
        return 200, {**registry.reset_offsets(name, batch), **stamp}
    raise AssertionError(action)


def _schema_route(reg: Any, action: str, name: str, body: dict) -> tuple[int, dict]:
    """Confluent-registry REST subset over SchemaRegistry: schema by id,
    register under subject, latest for subject. 404 unknown id/subject,
    400 malformed register body, 422 invalid schema."""
    if reg is None:
        return 404, {"error": "no schema registry configured"}
    from ..sources.avro_codec import AvroCodec, SchemaNotFoundError

    try:
        if action == "schema_by_id":
            return 200, {"id": int(name), "schema": reg.schema_for(int(name))}
        if action == "schema_register":
            schema = body.get("schema")
            if not isinstance(schema, str) or not schema:
                return 400, {"error": "body must carry {'schema': '<avsc json>'}"}
            try:
                AvroCodec(schema)  # validate before registering
            except (ValueError, KeyError, TypeError) as exc:
                return 422, {"error": f"invalid schema: {exc}"}
            return 200, {"id": reg.register(schema, subject=name)}
        if action == "schema_latest":
            sid, schema = reg.latest_for_subject(name)
            return 200, {
                "id": sid,
                "version": len(reg.subject_versions(name)),
                "schema": schema,
            }
    except SchemaNotFoundError as exc:
        return 404, {"error": str(exc)}
    raise AssertionError(action)


def _health(registry: Any) -> tuple[int, dict]:
    """GET /health: process liveness + per-stream run state. UP when the
    process serves (the compose healthcheck contract); stream states
    ride along so an orchestrator can also gate on RUNNING."""
    streams: dict[str, str] = {}
    try:
        for name in registry.names():
            streams[name] = registry.status(name).get("state", "UNKNOWN")
    except AttributeError:
        pass  # registry without enumeration (stub) — process liveness only
    return 200, {"status": "UP", "streams": streams, "timestamp": time.time()}


def _dim_route(
    store: Any, action: str, entity: str, key: Any, body: dict
) -> tuple[int, dict]:
    """Dimension CRUD status mapping, mirroring the reference controller
    (AnimalController.java:27-63): 200 + row/result; unknown entity or
    key -> 404; malformed row -> 400; other failures -> 422. PUT's path
    id wins over any id in the body (standard REST semantics)."""
    if store is None:
        return 404, {"error": "no dimension store configured"}
    stamp = {"timestamp": time.time()}
    try:
        if action == "dim_get":
            return 200, {**store.get(entity, key), **stamp}
        if action == "dim_upsert":
            return 200, {**store.upsert(entity, body), **stamp}
        if action == "dim_put":
            return 200, {**store.put(entity, key, body), **stamp}
        if action == "dim_delete":
            return 200, {**store.delete(entity, key), **stamp}
    except LookupError as exc:
        return 404, {"error": str(exc)}
    except ValueError as exc:
        return 400, {"error": str(exc)}
    except Exception as exc:
        return 422, {"error": f"dimension write failed: {exc}"}
    raise AssertionError(action)


def _export(exporter: Any, entity: str, body: dict) -> tuple[int, dict]:
    """POST /api/export/{entity}: status mapping mirrors the reference
    (200 + produced record; unprocessable payload -> 422,
    ManualAnimalExportController.java:74-76) with 400 reserved for the
    missing/zero-id caller error and 404 for unknown entities."""
    if exporter is None:
        return 404, {"error": "no exporter configured"}
    try:
        row = exporter(entity, body)
    except ValueError as exc:
        return 400, {"error": str(exc)}
    except LookupError as exc:
        return 404, {"error": str(exc)}
    except Exception as exc:
        return 422, {"error": f"Could not enrich payload: {exc}"}
    return 200, {"entity": entity, "exported": row, "timestamp": time.time()}
