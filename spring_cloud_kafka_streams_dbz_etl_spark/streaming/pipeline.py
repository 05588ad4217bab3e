"""CDC enrichment pipelines (the reference's topologies, vectorized).

Reference topology (SURVEY.md §3.1): CDC topic -> tombstone filter ->
envelope `after` extraction -> per-record REST enrichment -> branch
success/failure -> {output topic, DLQ topic}. Here each micro-batch runs
one broadcast join against the dimension and a dual parquet/Kafka write
inside ``foreachBatch`` — per-record failures become join misses tagged on
rows (never thrown), exactly mirroring the reference's EnrichResult
tagging (AnimalTransformerStream.java:30,36-53).

Failure semantics parity:
- DLQ rows keep the ORIGINAL envelope payload, not the half-parsed row
  (AnimalTransformerStream.java:55-59 unwraps EnrichResult::original).
- The DLQ reprocess stream is a second, independently checkpointed query
  over the DLQ directory with a throttle (max.poll.records:10 analogue)
  and auto_start=False (application.yml:49-56), started/stopped on demand
  via StreamRegistry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import events_envelope_schema
from ..sources.cdc import synthesize_event_envelopes
from ..sources.streams import stream_events, stream_parquet_dir

# DLQ rows are original payloads + failure context (key, value, reason).
DLQ_SCHEMA = T.StructType(
    [
        T.StructField("kafka_key", T.LongType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("reason", T.StringType(), True),
    ]
)

ENRICHED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("segment", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


@dataclass
class CdcPipelineConfig:
    sf_dir: str
    out_path: str
    dlq_path: str
    checkpoint: str
    dim_filter: str | None = None  # simulate broken enrichment (DLQ tests)
    max_files_per_trigger: int | None = None
    corrupt_every: int | None = None  # garble every Nth payload (deser-DLQ tests)
    idempotent: bool = False  # batch-id-keyed dynamic-overwrite sinks (exactly-once)
    # Optional source override: a zero-arg callable returning the raw
    # (kafka_key, value-json) streaming DataFrame. This is how the SAME
    # topology (parse -> enrich -> split -> dual sink) runs against a real
    # broker: pass sources.streams.kafka_raw_envelope_source(...) here
    # (see tests/test_kafka_integration.py). None = the sandbox's
    # file-source stand-in over sf_dir.
    raw_source: "Callable[[], DataFrame] | None" = None
    # Optional dimension override: a zero-arg callable returning the
    # enrichment dimension, re-invoked PER MICRO-BATCH (the reference's
    # always-fresh JPA lookup, §2A #22). This is how the topology runs
    # against the reference's actual source of truth — a JDBC database:
    # pass lambda: sources.streams.jdbc_dimension(spark, url, table, ...)
    # (proven against embedded Derby in tests/test_jdbc_dim.py). None =
    # the versioned parquet dimension store over sf_dir.
    dim_source: "Callable[[], DataFrame] | None" = None


def _parse_keep_original(raw: DataFrame) -> DataFrame:
    """Tombstone-filter + envelope parse, KEEPING the original payload
    column for DLQ fidelity. Delete/id==0 records are dropped (reference
    skips them silently, EventTransformerStream.java:43-58); records whose
    payload fails to DECODE are kept and flagged — the reference's
    framework-level deserialization DLQ (enable-dlq, application.yml:23-31)
    routes those, it does not drop them. from_json yields an all-null
    struct for malformed JSON (null only for empty input), and a real
    envelope always carries `op` — hence the parse_failed rule."""
    from ..functions.scalars import eval_once, no_pushdown

    schema = events_envelope_schema()
    # eval_once (r18): without it the envelope alias is inlined into
    # every consumer — the physical plan carried SIX from_json
    # evaluations per row (each flag/filter/projected field its own) —
    # see functions/scalars.py
    parsed = raw.filter(no_pushdown(F.col("value").isNotNull())).withColumn(
        "envelope", eval_once(F.from_json("value", schema))
    )
    parse_failed = F.col("envelope").isNull() | (
        F.col("envelope.op").isNull() & F.col("envelope.after").isNull()
    )
    flagged = parsed.withColumn("parse_failed", parse_failed)
    return flagged.filter(
        no_pushdown(
            F.col("parse_failed")
            | (F.col("envelope.after").isNotNull() & (F.col("envelope.after.id") != 0))
        )
    ).select(
        "kafka_key",
        "value",
        "parse_failed",
        F.col("envelope.after.id").alias("id"),
        F.col("envelope.after.user_id").alias("user_id"),
        F.col("envelope.after.event_type").alias("event_type"),
        F.col("envelope.after.value").alias("evt_value"),
    )


def _size_aware_broadcast(dim: DataFrame, memo: list | None = None) -> DataFrame:
    """Broadcast the enrichment dimension only when the optimizer's size
    estimate fits under autoBroadcastJoinThreshold; otherwise return it
    unhinted so Catalyst picks a shuffle join. The reference's dims are
    tiny (event/animal lookup tables), but an unconditional hint in the
    per-batch path would pin a fixed decision onto a dimension that may
    grow 100x — and AQE is disabled inside streaming queries, so a wrong
    static hint would never be demoted at runtime.

    ``memo`` (a mutable list owned by the pipeline) caches the DECISION
    across micro-batches: the size estimate costs a plan-analysis
    round-trip, and dimensions don't cross the broadcast threshold between
    batches in practice. The dimension DATA is still re-read every batch;
    a stream restart re-decides."""
    if memo:
        return F.broadcast(dim) if memo[0] else dim
    try:
        stats = dim._jdf.queryExecution().optimizedPlan().stats()
        size = int(stats.sizeInBytes().longValue())
        conf = dim.sparkSession._jsparkSession.sessionState().conf()
        threshold = int(conf.autoBroadcastJoinThreshold())
    except Exception:  # estimation unavailable -> let Catalyst decide
        return dim
    fits = 0 < threshold and 0 <= size <= threshold
    if memo is not None:
        memo.append(fits)
    return F.broadcast(dim) if fits else dim


def resilient_batch(fn):
    """Wrap a foreachBatch body: retry up to 3x when an input path
    vanishes between path resolution and execution-time file listing.
    With the dimension's immutable-version layout
    (sources/sinks.py::_commit_version) this is a belt-and-suspenders
    guard — the only remaining window is a version dir pruned while a
    micro-batch that resolved it two upserts ago is still running. (No isEmpty() pre-check: that action re-executes the
    micro-batch's repartition lineage on EVERY data batch, a worse cost
    than letting the rare empty batch run a no-op join.)

    Delivery contract: a failed attempt commits nothing in practice —
    the batch's joined relation persists MEMORY_AND_DISK during the
    first sink write, so the second write never re-reads the dimension,
    and FileOutputCommitter v1 exposes files only at job commit. The
    idempotent sink path is retry-safe unconditionally (batch-id-keyed
    overwrite)."""

    def wrapped(batch: DataFrame, batch_id: int) -> None:
        import time as _time

        last: Exception | None = None
        for _ in range(3):
            try:
                return fn(batch, batch_id)
            except Exception as exc:
                msg = str(exc)
                if (
                    "FileNotFoundException" not in msg
                    and "does not exist" not in msg
                    and "PATH_NOT_FOUND" not in msg
                ):
                    raise
                last = exc
                _time.sleep(0.2)
        raise last

    return wrapped


def _enrich_and_split(
    batch: DataFrame,
    dim: DataFrame,
    out_path: str,
    dlq_path: str,
    batch_id: int | None = None,
    idempotent: bool = False,
    broadcast_memo: list | None = None,
) -> None:
    """foreachBatch body: split off decode failures, one broadcast join,
    branch on join miss, dual write. Default delivery is at-least-once on
    batch retry (append is not transactional) — matching the reference's
    processing.guarantee default (CLAUDE.md:157-159); `idempotent=True`
    upgrades both sinks to batch-id-keyed DYNAMIC partition overwrite
    (sources/sinks.py::idempotent_batch_write), making epoch replay
    rewrite-in-place — effective exactly-once. The remaining at-least-once
    mitigations stay documented: downstream key+version dedup
    (q_window_rank / s_dedup_stream); s_offset_reset proves the
    replay-duplicate semantics end-to-end. Both DLQ reasons keep the
    ORIGINAL payload (reference parity: deserialization DLQ is
    framework-level, enrichment DLQ is explicit — application.yml:23-31 /
    AnimalTransformerStream.java:55-59)."""
    from pyspark import StorageLevel

    parsed_cache = None
    if "parse_failed" in batch.columns:
        # The corrupt/ok split consumes the PARSED batch twice (the ok
        # side through the joined persist below, the corrupt side
        # directly into the DLQ union) — without this cache the DLQ
        # branch re-executes the whole synthesize+parse codec from the
        # fan-out exchange (r18 census: a duplicate ~15 s-taskTime
        # 32-task stage per micro-batch). One micro-batch-sized
        # MEMORY_AND_DISK cache runs the codec once; spill-not-recompute
        # for the same retry-contract reason as `joined` below.
        parsed_cache = batch.persist(StorageLevel.MEMORY_AND_DISK)
        corrupt = parsed_cache.filter(F.col("parse_failed")).select(
            F.col("kafka_key"),
            F.col("value"),
            F.lit("parse_error").alias("reason"),
        )
        batch = parsed_cache.filter(~F.col("parse_failed"))
    else:  # DLQ-reprocess path re-parses already-valid payloads
        corrupt = None

    # MEMORY_AND_DISK (not cache/MEMORY_ONLY): eviction must spill, never
    # recompute — a recompute in the SECOND sink write would re-read the
    # dimension, breaking resilient_batch's nothing-committed-on-failure
    # retry contract (and double-appending on retry).
    joined = batch.join(
        _size_aware_broadcast(dim, broadcast_memo),
        batch.user_id == dim.c_custkey,
        "left",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        ok = joined.filter(F.col("c_custkey").isNotNull()).select(
            F.col("id"),
            F.col("user_id"),
            F.coalesce(F.col("c_name"), F.lit("")).alias("name"),
            F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
            F.col("event_type"),
            F.col("evt_value").alias("value"),
        )
        bad = joined.filter(F.col("c_custkey").isNull()).select(
            F.col("kafka_key"),
            F.col("value"),  # ORIGINAL envelope payload (reference parity)
            F.lit("enrichment_miss").alias("reason"),
        )
        if corrupt is not None:
            bad = bad.unionByName(corrupt)
        if idempotent:
            from ..sources.sinks import idempotent_batch_write

            idempotent_batch_write(ok, batch_id or 0, out_path)
            idempotent_batch_write(bad, batch_id or 0, dlq_path)
        else:
            ok.write.mode("append").parquet(out_path)
            bad.write.mode("append").parquet(dlq_path)
    finally:
        joined.unpersist()
        if parsed_cache is not None:
            parsed_cache.unpersist()


def build_cdc_pipeline(spark: SparkSession, cfg: CdcPipelineConfig):
    """Main CDC enrichment stream (§2A #1-#14). Returns an unstarted
    writer factory for StreamRegistry (so start/stop/reset own the
    lifecycle and checkpoint).

    The dimension is re-resolved PER MICRO-BATCH (fresh file listing +
    read), matching the reference's always-fresh REST lookup (§2A #22:
    CRUD upserts on the dimension are visible to the next batch). A
    build-time DataFrame would freeze the file listing forever."""

    def load_dim():
        # Resolves through the dimension's committed-version layout
        # (sources/sinks.py::load_dimension): the resolved version dir is
        # immutable, so a concurrent CRUD upsert can never yank files out
        # from under this micro-batch — no retry loop needed. Static dims
        # (plain testdata parquet) read directly. With cfg.dim_source the
        # resolver is the caller's (e.g. a JDBC read against the
        # reference's Postgres source of truth) — still per-batch, so
        # upstream CRUD writes are visible to the next micro-batch.
        if cfg.dim_source is not None:
            dim = cfg.dim_source()
        else:
            from ..sources.sinks import load_dimension

            dim = load_dimension(spark, f"{cfg.sf_dir}/customer.parquet")
        if cfg.dim_filter:
            dim = dim.filter(cfg.dim_filter)
        return dim
    if cfg.raw_source is not None:
        # Real-broker path: the caller's source already yields
        # (kafka_key, value-json) records; everything downstream —
        # parse, DLQ flagging, enrichment, split, sinks — is identical.
        raw = cfg.raw_source()
    else:
        # Decouple codec parallelism from source partitioning (a Kafka
        # topic's partition count, or here a single-row-group file):
        # shuffle the raw records across the cluster before the JSON
        # encode/decode stage. Project to the envelope's inputs FIRST so
        # the fan-out shuffle never carries unused columns (props alone
        # is most of the row's bytes).
        par = spark.sparkContext.defaultParallelism
        src = stream_events(spark, cfg.sf_dir, cfg.max_files_per_trigger).select(
            "event_id", "user_id", "event_type", "value"
        )
        raw = synthesize_event_envelopes(
            src.repartition(par), corrupt_every=cfg.corrupt_every
        )
    # The reference's peek()/log side-channel (§2A #13) as observe()
    # metrics: per-batch counts surface in query.lastProgress without
    # touching the data path (no extra action, no caching).
    parsed = _parse_keep_original(raw).observe(
        "cdc", F.count(F.lit(1)).alias("n_parsed")
    )

    def start():
        memo: list = []  # per-run broadcast decision (re-decided on restart)
        return (
            parsed.writeStream.outputMode("append")
            .option("checkpointLocation", cfg.checkpoint)
            .foreachBatch(
                resilient_batch(
                    lambda b, bid: _enrich_and_split(
                        b, load_dim(), cfg.out_path, cfg.dlq_path,
                        batch_id=bid, idempotent=cfg.idempotent,
                        broadcast_memo=memo,
                    )
                )
            )
            .start()
        )

    return start


def build_dlq_reprocess(
    spark: SparkSession,
    dlq_path: str,
    repair_sf_dir: str,
    out_path: str,
    checkpoint: str,
    throttle_files: int = 1,
):
    """DLQ reprocessing stream (§2A #15): reads the DLQ directory as a
    stream, re-parses the ORIGINAL payloads, enriches against the repair
    dimension (the reference's repair URL -> here the unbroken dim), and
    appends recovered records to the output. Independently checkpointed ->
    resumes from its own committed position after stop/start
    (DlqPipelineIT.java:128-170 semantics)."""

    def load_dim():
        from ..sources.sinks import load_dimension

        return load_dimension(spark, f"{repair_sf_dir}/customer.parquet")

    raw = stream_parquet_dir(spark, dlq_path, DLQ_SCHEMA, throttle_files)
    parsed = _parse_keep_original(raw.select("kafka_key", "value"))

    def start():
        memo: list = []  # throttled stream = many tiny batches; decide once
        return (
            parsed.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(
                # repair path: misses stay in a dead-letter parquet next to
                # the output (reprocessing can itself fail)
                resilient_batch(
                    lambda b, _id: _enrich_and_split(
                        b, load_dim(), out_path, out_path + "_dlq",
                        broadcast_memo=memo,
                    )
                )
            )
            .start()
        )

    return start
