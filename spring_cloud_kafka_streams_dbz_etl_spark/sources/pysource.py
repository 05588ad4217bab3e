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

Scale: offset planning reads only the two integer bookkeeping columns
(partition, offset) — never key/value data pages; record reads happen on
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
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
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


def _transcript_ends(path: str, exclude_file: str | None = None) -> dict:
    """Per-partition end offsets (max+1) over the committed transcript —
    a two-integer-column scan (partition, offset), never key/value data
    pages; {} for a missing or empty transcript. ``exclude_file``: skip
    one committed file — a replaying sink epoch must compute its base
    WITHOUT its own previous attempt, or re-commits would shift offsets.
    """
    import os as _o

    import pyarrow.dataset as ds

    try:
        data = ds.dataset(path, format="parquet")
    except (FileNotFoundError, OSError):
        return {}
    files = [
        f
        for f in data.files
        if exclude_file is None
        or _o.path.basename(f) != _o.path.basename(exclude_file)
    ]
    if not files:  # dir exists but holds no (other) committed file yet
        return {}
    tbl = ds.dataset(files, format="parquet").to_table(
        columns=["partition", "offset"]
    )
    if tbl.num_rows == 0:
        return {}
    grouped = tbl.group_by("partition").aggregate([("offset", "max")])
    return {
        int(p.as_py()): int(o.as_py()) + 1
        for p, o in zip(grouped["partition"], grouped["offset_max"])
    }


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
        # maxOffsetsPerTrigger parity (application.yml:36 max.poll.records
        # analogue): cap TOTAL records per micro-batch, spread across
        # partitions proportionally to their backlog like the JVM source.
        mot = options.get("maxOffsetsPerTrigger")
        self._max_offsets = int(mot) if mot else None
        self._committed: dict | None = None

    # -- offset bookkeeping (driver, metadata-only) -----------------------
    def _end_offsets(self) -> dict:
        ends = _transcript_ends(self._path)
        return {str(p): e for p, e in ends.items()}

    def initialOffset(self) -> dict:
        if self._starting == "earliest":
            return {p: 0 for p in self._end_offsets()}
        if self._starting == "latest":
            # new-records-only, like the Kafka source's startingOffsets
            # default for a fresh consumer group
            return self._end_offsets()
        return {str(k): int(v) for k, v in json.loads(self._starting).items()}

    def latestOffset(self) -> dict:
        ends = self._end_offsets()
        if not ends:
            return {}
        if self._max_offsets is None:
            return ends
        if self._committed is None:
            # First planning call of THIS run is uncapped: the reader
            # cannot see the checkpointed start (the no-arg latestOffset
            # API), and capping relative to earliest could plan an end
            # BELOW a restarted query's committed start — going backward.
            # Returning the full ends is always monotone-safe; Spark reads
            # only the actual backlog. Steady-state batches throttle.
            self._committed = ends
            return ends
        start = self._committed
        backlog = {p: int(e) - int(start.get(p, 0)) for p, e in ends.items()}
        total = sum(b for b in backlog.values() if b > 0)
        if total <= self._max_offsets:
            self._committed = ends
            return ends
        # proportional cap per partition (ceil so progress is guaranteed)
        capped = {}
        for p, e in ends.items():
            b = max(backlog[p], 0)
            take = -(-b * self._max_offsets // total) if b else 0  # ceil
            capped[p] = int(start.get(p, 0)) + min(b, take)
        self._committed = capped
        return capped

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

    def streamWriter(self, schema, overwrite):
        return KafkaTranscriptStreamWriter(self.options)


def register_kafka_transcript_source(spark) -> None:
    """Idempotently register the connector on this session."""
    spark.dataSource.register(KafkaTranscriptDataSource)


# -- the write half: the connector as a pluggable streaming SINK ----------


class _StagedCommit(WriterCommitMessage):
    def __init__(self, staged_path: str):
        self.staged_path = staged_path


class KafkaTranscriptStreamWriter(DataSourceStreamWriter):
    """Per-epoch broker-append semantics as a pluggable sink: executors
    stage this epoch's (key, value, partition) rows; ``commit`` — the
    sequencer role a broker plays — assigns dense per-partition offsets
    continuing from the transcript's current ends and appends ONE
    committed file per epoch; ``abort`` discards the staging. Offset
    assignment sorts each partition's rows by (key, value) bytes and
    computes its base EXCLUDING the epoch's own previous attempt, so a
    replayed epoch assigns identically and overwrites its own file
    (deterministic recovery). Demo-connector honesty: this commit
    MATERIALIZES the epoch's bytes on the driver to stamp offsets —
    fine at micro-batch sizes; the production shape keeps data
    executor-side and publishes per-file base offsets as a manifest
    (offsets derived at read), or uses the distributed foreachBatch
    sink (kafka_transcript_sink).
    Delivery is at-least-once on a crash between commit and checkpoint
    (Kafka producer default); the exactly_once_v2 upgrade is the txn
    sidecar (`kafka_replay.read_committed`)."""

    def __init__(self, options: dict):
        import hashlib
        import os

        self._path = options["path"]
        self._topic = options.get("topic", "entity.events.enriched")
        # staging is scoped PER QUERY via its checkpointLocation (unique
        # per streaming query by construction, and visible to every writer
        # instance Spark creates — one per epoch, plus the executor-side
        # pickles), so two queries writing the same transcript path never
        # sweep each other's not-yet-committed epochs (ADVICE r05). A
        # query with no checkpoint set falls back to a shared scope, which
        # re-assumes single-writer-per-path. Scopes abandoned by a crashed
        # query are inert garbage under <path>__staging/ — safe to delete
        # out-of-band, never read by a live query.
        root = options.get("staging", self._path.rstrip("/") + "__staging")
        ckpt = options.get("checkpointlocation") or options.get("checkpointLocation")
        scope = (
            "query_" + hashlib.md5(ckpt.encode()).hexdigest()[:12]
            if ckpt
            else "shared"
        )
        self._staging = os.path.join(root, scope)

    def write(self, rows) -> _StagedCommit:  # executor-side
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        keys, values, parts = [], [], []
        for row in rows:
            keys.append(bytes(row.key))
            values.append(bytes(row.value))
            parts.append(int(row.partition))
        os.makedirs(self._staging, exist_ok=True)
        p = os.path.join(self._staging, f"stage_{uuid.uuid4().hex}.parquet")
        pq.write_table(
            pa.table(
                {
                    "key": pa.array(keys, pa.binary()),
                    "value": pa.array(values, pa.binary()),
                    "partition": pa.array(parts, pa.int32()),
                }
            ),
            p,
        )
        return _StagedCommit(p)

    def _end_offsets(self) -> dict:
        return _transcript_ends(self._path)

    def commit(self, messages, batchId: int) -> None:  # driver-side sequencer
        import datetime
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        own_file = f"epoch_{batchId:06d}.parquet"
        staged = [
            pq.read_table(m.staged_path) for m in messages if m is not None
        ]
        staged = [t for t in staged if t.num_rows]
        if staged:
            all_rows = pa.concat_tables(staged)
            # base EXCLUDES this epoch's own file: a replayed commit after
            # a crash-before-checkpoint must re-assign the SAME offsets
            # (the file overwrites under the same name), not shift past
            # its previous attempt and tear a hole in the offset sequence
            base = _transcript_ends(self._path, exclude_file=own_file)
            by_part: dict[int, list] = {}
            for k, v, p in zip(
                all_rows["key"].to_pylist(),
                all_rows["value"].to_pylist(),
                all_rows["partition"].to_pylist(),
            ):
                by_part.setdefault(int(p), []).append((k, v))
            keys, values, parts, offsets = [], [], [], []
            now = datetime.datetime.now(datetime.timezone.utc)
            for p in sorted(by_part):
                rows = sorted(by_part[p])  # deterministic offsets on replay
                start = int(base.get(p, 0))
                for i, (k, v) in enumerate(rows):
                    keys.append(k)
                    values.append(v)
                    parts.append(p)
                    offsets.append(start + i)
            n = len(keys)
            committed = pa.table(
                {
                    "key": pa.array(keys, pa.binary()),
                    "value": pa.array(values, pa.binary()),
                    "topic": pa.array([self._topic] * n),
                    "partition": pa.array(parts, pa.int32()),
                    "offset": pa.array(offsets, pa.int64()),
                    "timestamp": pa.array([now] * n, pa.timestamp("us", "UTC")),
                    "timestampType": pa.array([1] * n, pa.int32()),
                }
            )
            os.makedirs(self._path, exist_ok=True)
            pq.write_table(committed, os.path.join(self._path, own_file))
        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)
        # epochs are serial per query and staging is scoped to THIS
        # writer instance, so anything left here is an orphan from a
        # failed/speculative task attempt of this query — sweep it
        # without touching other queries' scopes
        if os.path.isdir(self._staging):
            for f in os.listdir(self._staging):
                try:
                    os.remove(os.path.join(self._staging, f))
                except OSError:
                    pass
            # drop this writer's (now empty) scope, then the shared root
            # iff no other query holds a live scope there
            for d in (self._staging, os.path.dirname(self._staging)):
                try:
                    os.rmdir(d)
                except OSError:
                    break

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)
