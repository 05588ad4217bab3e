"""HTTP-facing dimension CRUD adapter (§2A #22).

The reference's dim app is a REST CRUD controller over the enrichment
table (AnimalController.java:27-63: GET/POST/PUT/DELETE /api/animals/{id})
whose writes are picked up by the stream's next lookup. The engine's
write path is ``sources.sinks`` (versioned, atomic, time-travelable);
this adapter maps entity-name + JSON-row requests onto it so the HTTP
facade can expose the same four verbs. The streaming pipeline re-reads
the dimension per micro-batch, so a POST/PUT/DELETE here is visible to
the next batch — the reference's PUT-visible-to-next-lookup contract.

Scale: each call is one dimension-sized job (dims are small relative to
facts); the heavy path (enrichment) never goes through HTTP.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession


class DimStore:
    """CRUD over named dimensions: ``entities`` maps entity name ->
    (dimension path, key column). Raises LookupError for unknown
    entities/keys (-> 404) and ValueError for malformed rows (-> 400),
    matching the facade's status mapping."""

    def __init__(self, spark: SparkSession, entities: dict[str, tuple[str, str]]):
        self._spark = spark
        self._entities = dict(entities)

    def _resolve(self, entity: str) -> tuple[str, str]:
        if entity not in self._entities:
            raise LookupError(f"unknown dimension entity {entity!r}")
        return self._entities[entity]

    def _load(self, path: str):
        from ..sources.sinks import load_dimension

        return load_dimension(self._spark, path)

    @staticmethod
    def _coerce_key(df, key_col: str, key: Any):
        """Cast the URL path segment to the dimension's key type so
        ``/api/dim/customer/7`` matches a bigint 7."""
        dtype = dict(df.dtypes)[key_col]
        if dtype in ("bigint", "int", "smallint", "tinyint"):
            try:
                return int(key)
            except (TypeError, ValueError):
                raise ValueError(f"key {key!r} is not an integer ({key_col}: {dtype})")
        return key

    def get(self, entity: str, key: Any) -> dict:
        path, key_col = self._resolve(entity)
        df = self._load(path)
        rows = df.filter(df[key_col] == self._coerce_key(df, key_col, key)).limit(1).collect()
        if not rows:
            raise LookupError(f"{entity} {key!r} not found")
        return rows[0].asDict(recursive=True)

    def upsert(self, entity: str, row: dict) -> dict:
        from ..sources.sinks import upsert_dimension

        path, key_col = self._resolve(entity)
        if not isinstance(row, dict) or key_col not in row:
            raise ValueError(f"body must be a row dict carrying {key_col!r}")
        df = self._load(path)
        extra = set(row) - set(df.columns)
        if extra:
            raise ValueError(f"unknown columns {sorted(extra)}; dimension has {df.columns}")
        full = {c: row.get(c) for c in df.columns}
        batch = self._spark.createDataFrame([tuple(full[c] for c in df.columns)], df.schema)
        result = upsert_dimension(batch, path, keys=[key_col])
        return {"entity": entity, key_col: row[key_col], **result}

    def put(self, entity: str, key: Any, row: dict) -> dict:
        """PUT /api/dim/{entity}/{id}: the path id wins over any id in the
        body (standard REST semantics), then upsert."""
        path, key_col = self._resolve(entity)
        df = self._load(path)
        return self.upsert(entity, {**row, key_col: self._coerce_key(df, key_col, key)})

    def delete(self, entity: str, key: Any) -> dict:
        from ..sources.sinks import delete_from_dimension

        path, key_col = self._resolve(entity)
        df = self._load(path)
        k = self._coerce_key(df, key_col, key)
        if not df.filter(df[key_col] == k).limit(1).collect():
            raise LookupError(f"{entity} {key!r} not found")
        keys_df = self._spark.createDataFrame([(k,)], [key_col])
        result = delete_from_dimension(self._spark, path, [key_col], keys_df)
        return {"entity": entity, key_col: k, "deleted": 1, **result}
