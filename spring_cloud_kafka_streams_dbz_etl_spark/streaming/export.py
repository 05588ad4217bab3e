"""Manual export bypassing CDC (reference §2A #21).

Reference: POST /api/export/animal builds AnimalDetails(+RecordKey) from a
caller-supplied JSON body — accepting either a bare entity or a full
change envelope, falling back after -> root
(ManualAnimalExportController.java:51-63) — and synchronously produces to
the output topic. Engine twin: one-row DataFrame -> append to the sink.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..streaming.pipeline import ENRICHED_SCHEMA


def parse_export_payload(payload: str | dict[str, Any]) -> dict[str, Any]:
    """Envelope-or-entity fallback (after -> root), as the reference does."""
    body = json.loads(payload) if isinstance(payload, str) else payload
    entity = body.get("after") if isinstance(body.get("after"), dict) else body
    if entity.get("id") in (None, 0):
        raise ValueError("export payload requires a non-zero 'id'")
    return entity


def manual_export(
    spark: SparkSession, payload: str | dict[str, Any], out_path: str
) -> DataFrame:
    """Build the enriched-record row and append it to the output sink
    synchronously (the reference's flush()). Returns the written row."""
    entity = parse_export_payload(payload)
    row = {
        "id": int(entity["id"]),
        "user_id": int(entity.get("user_id", 0)),
        "name": str(entity.get("name", "")),
        "segment": str(entity.get("segment", "UNKNOWN")),
        "event_type": str(entity.get("event_type", "manual")),
        "value": float(entity.get("value", 0.0)),
    }
    df = spark.createDataFrame([row], schema=ENRICHED_SCHEMA)
    df.write.mode("append").parquet(out_path)
    return df


def make_exporter(spark: SparkSession, out_paths: dict[str, str]):
    """Bind manual_export to the HTTP facade's exporter contract:
    (entity_name, body_dict) -> exported-row dict. Unknown entities raise
    LookupError (-> 404); payload errors propagate as ValueError (-> 400).

    ``out_paths`` maps entity name -> sink path (the reference has one
    hardwired topic per controller; the engine generalizes to a map)."""

    def export(entity: str, body: dict[str, Any]) -> dict[str, Any]:
        if entity not in out_paths:
            raise LookupError(f"unknown export entity {entity!r}; known: {sorted(out_paths)}")
        return manual_export(spark, body, out_paths[entity]).first().asDict()

    return export
