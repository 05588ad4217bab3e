"""Custom Spark 4 Python DataSource: the Kafka-transcript topic as a
first-class `spark.readStream.format("kafka_transcript")` source.

This closes the gap between the file-source stand-in (offsets = file
batch ids) and a real Kafka reader (offsets = per-partition record
positions): the connector speaks the ACTUAL Kafka offset contract —
`initialOffset` = earliest per partition, `latestOffset` polls the
broker (here: the transcript's committed end offsets), `partitions`
plans one InputPartition per topic-partition slice so executors read in
parallel, and replaying any [start, end) offset range is deterministic
(exactly what checkpoint recovery does). Reference parity: §2A #1's
consumer contract (application.yml:38-44 — subscribe, earliest default)
minus only the socket, same as every transcript path (KAFKA.md).

Registered per session via :func:`register_kafka_transcript_source`;
options: ``path`` (transcript dir), ``startingOffsets``
('earliest' | JSON {"partition": offset}).

Scale: offset planning is metadata-only on the driver (a per-partition
max over the transcript footer columns); record reads happen on
executors, one task per topic-partition — the same parallelism model as
the JVM Kafka source. The Python row boundary is the demo cost; the
production reader is spark-sql-kafka, which this source's consumers
swap in unchanged (same output schema).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
    ]
)


class _SliceP(InputPartition):
    def __init__(self, path: str, partition: int, start: int, end: int):
        self.path = path
        self.partition = partition
        self.start = start
        self.end = end


class KafkaTranscriptStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._path = options["path"]
        self._starting = options.get("startingOffsets", "earliest")

    # -- offset bookkeeping (driver, metadata-only) -----------------------
    def _end_offsets(self) -> dict:
        import pyarrow.dataset as ds
        import pyarrow.compute as pc

        try:
            data = ds.dataset(self._path, format="parquet")
            tbl = data.to_table(columns=["partition", "offset"])
        except (FileNotFoundError, OSError):
            return {}
        if tbl.num_rows == 0:
            return {}
        import pyarrow as pa

        grouped = tbl.group_by("partition").aggregate([("offset", "max")])
        return {
            str(p.as_py()): o.as_py() + 1
            for p, o in zip(grouped["partition"], grouped["offset_max"])
        }

    def initialOffset(self) -> dict:
        if self._starting == "earliest":
            return {p: 0 for p in self._end_offsets()}
        return {str(k): int(v) for k, v in json.loads(self._starting).items()}

    def latestOffset(self) -> dict:
        ends = self._end_offsets()
        # partitions can appear mid-stream; unseen ones start at 0
        return ends or {}

    def partitions(self, start: dict, end: dict):
        out = []
        for p, hi in end.items():
            lo = int(start.get(p, 0))
            if int(hi) > lo:
                out.append(_SliceP(self._path, int(p), lo, int(hi)))
        # Spark requires >= 1 partition per batch even when empty
        return out or [_SliceP(self._path, 0, 0, 0)]

    # -- record reads (executors, one task per topic-partition slice) -----
    def read(self, part: _SliceP):
        if part.end <= part.start:
            return iter(())
        import pyarrow.dataset as ds
        import pyarrow.compute as pc

        data = ds.dataset(part.path, format="parquet")
        tbl = data.to_table(
            columns=["key", "value", "partition", "offset"],
            filter=(
                (pc.field("partition") == part.partition)
                & (pc.field("offset") >= part.start)
                & (pc.field("offset") < part.end)
            ),
        )
        ks, vs = tbl["key"].to_pylist(), tbl["value"].to_pylist()
        ps, os_ = tbl["partition"].to_pylist(), tbl["offset"].to_pylist()
        return iter(zip(ks, vs, ps, os_))

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint (the engine's model)


class KafkaTranscriptDataSource(DataSource):
    """`format("kafka_transcript")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "kafka_transcript"

    def schema(self):
        return TRANSCRIPT_SCHEMA

    def streamReader(self, schema):
        return KafkaTranscriptStreamReader(self.options)


def register_kafka_transcript_source(spark) -> None:
    """Idempotently register the connector on this session."""
    spark.dataSource.register(KafkaTranscriptDataSource)
