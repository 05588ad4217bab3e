"""Source-format and UDTF surface.

The reference consumes Kafka records in two serializations — Avro
(GenericAvroSerde, application.yml:13-16) and JSON (the REST enrichment
payload, EventTransformerStream.java:67-72). The JSON and CSV
schema-on-read paths are proven value-for-value by round-tripping the
events table through each format against the parquet ground truth; the
Avro path is proven the same way by q_avro_roundtrip, which pushes every
event through the Confluent wire format (magic byte + schema id + Avro
binary body, sources/avro_codec.py) on executors. When spark-avro is on
the classpath, sources/streams.py::confluent_avro_value is the
zero-Python fast path for the same framing.

Also the Python UDTF surface (Spark 4): a table function expanding one
row into many — the generalization of the reference's one-in/one-out
mapValues enrichment to one-in/N-out.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..session import tune
from . import query

_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
_EVENTS_ORACLE = "SELECT event_id, ts, user_id, event_type, value, props FROM events"


def _tmpdir(kind: str) -> str:
    # Query-scoped scratch (swept on next query entry + atexit backstop) —
    # the ADVICE-r15 lifetime rule; bare mkdtemp leaked trees per sweep.
    from . import scratch_dir

    return scratch_dir(f"scksde_{kind}_{uuid.uuid4().hex[:8]}_")


@query("q_json_source", oracle=_EVENTS_ORACLE)
def q_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over JSON lines: events written as JSONL, read back
    with an explicit schema — no inference pass, exact value round-trip
    (timestamps micro-precision, doubles shortest-repr). The reference's
    JSON consumption (Jackson tree navigation) is this plus
    get_json_object for nested access (q_scalar_funcs).

    Scale: explicit schema means a single scan (inference would double-
    read); JSONL splits by line so the format stays parallelizable.
    """
    tune(spark)
    # ts is TIMESTAMP_NTZ (catalog.table converts the testdata's nano longs);
    # NTZ columns are governed by timestampNTZFormat, not timestampFormat,
    # and both defaults drop micros — set both so either column type
    # round-trips at full precision.
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ev = table(spark, sf_dir, "events").select(*_EVENT_COLS)
    path = _tmpdir("json_src")
    (
        ev.write.mode("overwrite")
        .option("timestampFormat", ts_fmt)
        .option("timestampNTZFormat", ts_fmt)
        .json(path)
    )
    return (
        spark.read.schema(ev.schema)
        .option("timestampFormat", ts_fmt)
        .option("timestampNTZFormat", ts_fmt)
        .json(path)
        .select(*_EVENT_COLS)
    )


@query("q_csv_source", oracle=_EVENTS_ORACLE)
def q_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over CSV with header + quoted fields (props is a JSON
    string containing commas/quotes) and micro-precision timestamps —
    the degenerate-format path every ingest pipeline eventually needs.
    """
    tune(spark)
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ev = table(spark, sf_dir, "events").select(*_EVENT_COLS)
    path = _tmpdir("csv_src")
    (
        ev.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", ts_fmt)
        .option("timestampNTZFormat", ts_fmt)
        .csv(path)
    )
    return (
        spark.read.schema(ev.schema)
        .option("header", "true")
        .option("timestampFormat", ts_fmt)
        .option("timestampNTZFormat", ts_fmt)
        .csv(path)
        .select(*_EVENT_COLS)
    )


@query(
    "q_avro_roundtrip",
    oracle="""
SELECT event_id AS id, user_id, event_type, value,
       'c' AS op, 'events' AS src_table, event_id AS lsn
FROM events
""",
)
def q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Avro serde path (§2A #2), end-to-end on executors:
    every event becomes a Debezium-style change envelope, is serialized to
    Avro BINARY (union-index prefixes, zigzag varints, IEEE doubles) and
    framed exactly like KafkaAvroSerializer output (magic 0x00 + 4-byte
    schema id — the framing KafkaTestHelper.java:36-49 consumes), then a
    SECOND stage unframes + decodes and projects ``after.*`` — so the
    oracle check proves the wire bytes are a faithful interchange format,
    value-for-value against the parquet ground truth.

    Scale: both codec stages are Arrow-batched mapInPandas (serialization
    is inherently per-record work — this is the legitimate Python-touches-
    data case); they pipeline map-only with zero shuffles, so throughput
    scales with partitions like any scan-transform stage.
    """
    import pandas as pd

    from ..sources.avro_codec import (
        EVENTS_ENVELOPE_AVSC,
        AvroCodec,
        confluent_frame,
        confluent_unframe,
    )

    tune(spark)
    schema_id = 7  # registry-assigned id in production; any fixed id here
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )

    def encode(batches):
        codec = AvroCodec(EVENTS_ENVELOPE_AVSC)
        for pdf in batches:
            framed = []
            for r in pdf.itertuples(index=False):
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
                framed.append(confluent_frame(schema_id, codec.encode(envelope)))
            yield pd.DataFrame({"kafka_value": framed})

    def decode(batches):
        codec = AvroCodec(EVENTS_ENVELOPE_AVSC)
        for pdf in batches:
            cols: dict[str, list] = {
                "id": [], "user_id": [], "event_type": [],
                "value": [], "op": [], "src_table": [], "lsn": [],
            }
            for buf in pdf["kafka_value"]:
                sid, body = confluent_unframe(bytes(buf))
                if sid != schema_id:
                    raise ValueError(f"unexpected schema id {sid}")
                env = codec.decode(body)
                after = env["after"]
                cols["id"].append(after["id"])
                cols["user_id"].append(after["user_id"])
                cols["event_type"].append(after["event_type"])
                cols["value"].append(after["value"])
                cols["op"].append(env["op"])
                cols["src_table"].append(env["source"]["table"])
                cols["lsn"].append(env["source"]["lsn"])
            yield pd.DataFrame(cols)

    framed = ev.mapInPandas(encode, "kafka_value binary")
    return framed.mapInPandas(
        decode,
        "id long, user_id long, event_type string, value double, "
        "op string, src_table string, lsn long",
    )


@query(
    "q_udtf_tokens",
    oracle="""
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(LENGTH(tok)) AS BIGINT) AS total_len,
       CAST(MAX(LENGTH(tok)) AS BIGINT) AS max_len
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
WHERE tok <> ''
GROUP BY doc_id
""",
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): expand each document into its
    tokens via a LATERAL table-function join, then aggregate per doc.
    One-row-in/N-rows-out — the shape the reference's mapValues enrichment
    cannot express (it is strictly 1:1, AnimalTransformerStream.java:38).

    Scale: UDTFs run Arrow-batched per partition like any Python UDF; the
    aggregation above them is map-side combinable, so the exploded rows
    never cross the shuffle. (For pure splitting, built-in explode/split
    is faster — q_top_terms uses that; this query pins the UDTF API.)
    """
    from pyspark.sql.functions import udtf

    tune(spark)

    @udtf(returnType="tok: string, tok_len: int")
    class Tokenize:
        def eval(self, text: str):
            for t in (text or "").split(" "):
                if t:
                    yield t, len(t)

    spark.udtf.register("scksde_tokenize", Tokenize)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf")
    return spark.sql(
        """
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(tok_len) AS BIGINT) AS total_len,
       CAST(MAX(tok_len) AS BIGINT) AS max_len
FROM documents_udtf d, LATERAL scksde_tokenize(d.text) t
GROUP BY doc_id
"""
    )


@query(
    "q_hash_split",
    oracle="""
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split-seed-42'), 1, 8)) AS BIGINT) % 100 AS INT) AS bucket
      FROM documents)
""",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5) by content-hash
    bucket: md5(id + seed) -> bucket 0-99 -> split. Unlike random
    sampling, the assignment is stable across runs, engines, partitionings
    and re-ingests — the property a reproducible training corpus needs
    (and the reason sample()/TABLESAMPLE, whose RNG is engine-specific,
    can't be oracle-checked at all).

    Scale: pure map, no shuffle, no state; the same hash rule shards any
    table identically on any cluster size.
    """
    tune(spark)
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split-seed-42"))), 1, 8), 16, 10)
        .cast("long") % 100
    ).cast("int")
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(F.col("bucket") < 90, "train")
        .when(F.col("bucket") < 95, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "q_avro_registry_dlq",
    oracle="""
SELECT event_id AS id, user_id, event_type, value, 'c' AS op,
       FALSE AS parse_failed, CAST(NULL AS VARCHAR) AS error
FROM events WHERE event_id % 7 <> 0
UNION ALL
SELECT CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
       CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
       TRUE, 'schema id 99 not registered'
FROM events WHERE event_id % 7 = 0
""",
)
def q_avro_registry_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-registry resolution + deserialization-DLQ split (§2A #2/#12):
    producers frame every record with a writer-schema id; one producer in
    seven is misconfigured and frames with an id the registry never
    assigned (id 99). The consumer resolves each record's writer schema
    through SchemaRegistry — known ids decode to ``after.*`` rows,
    unknown ids raise SchemaNotFoundError and are routed to error rows
    with parse_failed=true instead of crashing the stream, mirroring the
    reference's enable-dlq deserialization handler (application.yml:23-31;
    registry resolution: application.yml:16).

    Scale: same two map-only Arrow-batched codec stages as
    q_avro_roundtrip; the registry is schema metadata (bytes, not data)
    shipped whole inside the closure — no lookup service in the hot path.
    """
    import pandas as pd

    from ..sources.avro_codec import (
        EVENTS_ENVELOPE_AVSC,
        SchemaNotFoundError,
        SchemaRegistry,
    )

    tune(spark)
    registry = SchemaRegistry()
    good_id = registry.register(EVENTS_ENVELOPE_AVSC)
    bad_id = 99  # never registered

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )

    def encode(batches):
        for pdf in batches:
            framed = []
            for r in pdf.itertuples(index=False):
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
                body = registry.codec_for(good_id).encode(envelope)
                sid = bad_id if int(r.event_id) % 7 == 0 else good_id
                from ..sources.avro_codec import confluent_frame

                framed.append(confluent_frame(sid, body))
            yield pd.DataFrame({"kafka_value": framed})

    def decode(batches):
        for pdf in batches:
            cols: dict[str, list] = {
                "id": [], "user_id": [], "event_type": [], "value": [],
                "op": [], "parse_failed": [], "error": [],
            }
            for buf in pdf["kafka_value"]:
                try:
                    _, env = registry.decode_framed(bytes(buf))
                    after = env["after"]
                    row = (after["id"], after["user_id"], after["event_type"],
                           after["value"], env["op"], False, None)
                except (SchemaNotFoundError, ValueError) as exc:
                    row = (None, None, None, None, None, True, str(exc))
                for k, v in zip(cols, row):
                    cols[k].append(v)
            yield pd.DataFrame(cols)

    framed = ev.mapInPandas(encode, "kafka_value binary")
    return framed.mapInPandas(
        decode,
        "id long, user_id long, event_type string, value double, "
        "op string, parse_failed boolean, error string",
    )


@query(
    "q_schema_evolution",
    oracle="""
SELECT event_id, user_id, value,
       CASE WHEN event_id % 2 = 0 THEN NULL
            ELSE 'r' || CAST(user_id % 4 AS VARCHAR) END AS source_region
FROM events
""",
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the sink/lake path: the upstream producer adds
    a column mid-stream (the Debezium reality every CDC consumer faces —
    ALTER TABLE upstream, new envelope fields downstream). Generation 1
    files lack ``source_region``; generation 2 files carry it; a
    mergeSchema read unifies them with NULLs for pre-evolution rows —
    no rewrite of old data, the additive-evolution contract Avro/
    parquet/table formats share.

    Scale: schema merge is a FOOTER-level operation (per-file schemas
    union at planning; data pages are untouched); the read stays one
    scan. Pin the merged schema in production readers (mergeSchema scans
    footers of every file — fine per table, not per query at 100 TB;
    table formats track the evolved schema in metadata for exactly this
    reason)."""
    tune(spark)
    ev = table(spark, sf_dir, "events")
    path = _tmpdir("schema_evo")
    gen1 = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "user_id", "value")
    gen2 = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        "user_id",
        "value",
        F.concat(F.lit("r"), (F.col("user_id") % 4).cast("string")).alias(
            "source_region"
        ),
    )
    gen1.write.mode("overwrite").parquet(f"{path}/d=1")
    gen2.write.mode("overwrite").parquet(f"{path}/d=2")
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(path)
        .select("event_id", "user_id", "value", "source_region")
    )


@query("q_orc_source", oracle=_EVENTS_ORACLE)
def q_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over ORC — the other columnar format a lake-side
    consumer meets (Hive-era tables feeding the same CDC topics). Events
    round-trip through ORC against the parquet ground truth: predicate
    pushdown, column pruning, and stripe statistics work exactly like
    parquet's, so every operator upstream is format-agnostic.

    Scale: ORC stripes parallelize like parquet row groups; the engine's
    scan-layer properties (pushdown/pruning, test_plans.py) hold
    unchanged because they're DataSource-level, not format-level."""
    tune(spark)
    ev = table(spark, sf_dir, "events").select(*_EVENT_COLS)
    path = _tmpdir("orc_src")
    ev.write.mode("overwrite").orc(path)
    return spark.read.schema(ev.schema).orc(path).select(*_EVENT_COLS)


@query(
    "q_text_log_source",
    oracle="""
SELECT event_id, user_id, event_type,
       CAST(ts AS TIMESTAMP) AS ts
FROM (
  SELECT CAST(regexp_extract(line, '^\\[([^\\]]+)\\] id=([0-9]+) user=([0-9]+) type=(\\w+)$', 1) AS VARCHAR) AS ts,
         CAST(regexp_extract(line, '^\\[([^\\]]+)\\] id=([0-9]+) user=([0-9]+) type=(\\w+)$', 2) AS BIGINT) AS event_id,
         CAST(regexp_extract(line, '^\\[([^\\]]+)\\] id=([0-9]+) user=([0-9]+) type=(\\w+)$', 3) AS BIGINT) AS user_id,
         regexp_extract(line, '^\\[([^\\]]+)\\] id=([0-9]+) user=([0-9]+) type=(\\w+)$', 4) AS event_type
  FROM (
    SELECT '[' || strftime(ts, '%Y-%m-%d %H:%M:%S') || '] id=' || event_id
           || ' user=' || user_id || ' type=' || event_type AS line
    FROM events))
""",
)
def q_text_log_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unstructured text-log ingestion: events rendered as classic
    bracket-timestamp log lines, written with the text datasource, read
    back line-at-a-time and re-structured with one anchored regex —
    the grep-to-DataFrame path every pipeline needs for the logs that
    never got a schema. (Seconds precision: log timestamps rarely carry
    micros; the oracle renders and re-parses the same way.)

    Scale: text splits by line; the regex is a single codegen'd
    regexp_extract per field over one scan — no Python, no shuffle;
    malformed lines yield empty extracts and can be DLQ-split exactly
    like the CDC parse path."""
    tune(spark)
    ev = table(spark, sf_dir, "events")
    line = F.concat(
        F.lit("["), F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), F.lit("] id="),
        F.col("event_id"), F.lit(" user="), F.col("user_id"),
        F.lit(" type="), F.col("event_type"),
    )
    path = _tmpdir("textlog_src")
    ev.select(line.alias("value")).write.mode("overwrite").text(path)
    rx = r"^\[([^\]]+)\] id=([0-9]+) user=([0-9]+) type=(\w+)$"
    lines = spark.read.text(path)
    return lines.select(
        F.regexp_extract("value", rx, 2).cast("bigint").alias("event_id"),
        F.regexp_extract("value", rx, 3).cast("bigint").alias("user_id"),
        F.regexp_extract("value", rx, 4).alias("event_type"),
        F.to_timestamp(F.regexp_extract("value", rx, 1)).alias("ts"),
    )


@query("q_xml_source", oracle=_EVENTS_ORACLE)
def q_xml_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over XML (Spark 4 native `xml` format, the former
    spark-xml package donated into core): events written one <row>
    element per record, read back with the explicit schema — completing
    the lake-format family (parquet/ORC/JSON/CSV/Avro/text-log/XML).
    XML is the interchange reality of enterprise CDC feeds (SOAP
    exports, JMS bridges) that front many ingest pipelines.

    Scale: like JSONL, an explicit schema avoids the inference pre-scan;
    unlike JSONL, element boundaries are not line boundaries, so the
    reader splits on the rowTag — keep individual documents modest and
    files many for parallelism. props carries markup-significant
    characters (quotes, braces) through XML escaping, which is the
    round-trip hazard this query pins."""
    tune(spark)
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ev = table(spark, sf_dir, "events").select(*_EVENT_COLS)
    path = _tmpdir("xml_src")
    (
        ev.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "events")
        .option("rowTag", "event")
        .option("timestampFormat", ts_fmt)
        .option("timestampNTZFormat", ts_fmt)
        .save(path)
    )
    return (
        spark.read.schema(ev.schema)
        .format("xml")
        .option("rowTag", "event")
        .option("timestampFormat", ts_fmt)
        .option("timestampNTZFormat", ts_fmt)
        .load(path)
        .select(*_EVENT_COLS)
    )


@query(
    "q_binary_source",
    oracle="""
SELECT printf('doc_%06d.bin', doc_id) AS file_name,
       CAST(octet_length(encode(text)) AS BIGINT) AS length,
       md5(text) AS content_md5
FROM documents WHERE doc_id % 5 = 0
""",
)
def q_binary_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `binaryFile` source — how raw media lands in the engine when
    it arrives as FILES (an image/audio dump directory), completing the
    source family (json/csv/orc/xml/text/avro/binary): each blob
    becomes one row (path, modificationTime, length, content), here
    staged deterministically from every 5th document's bytes, read back
    whole-file, and fingerprinted. Downstream is the multimodal
    pipeline (q_media_decode takes exactly this payload shape).

    Scale: binaryFile is splittable BY FILE — parallelism = file count,
    and `pathGlobFilter`/`recursiveFileLookup` prune at listing time;
    content bytes stay opaque (no row-level parse cost). Keep blob
    dirs sharded (the writer stages one dir per id-bucket here) so
    listing itself distributes; the format caps per-file size at
    spark.sql.sources.binaryFile.maxLength (2 GiB default) — beyond
    that, media belongs in object storage with a manifest table, the
    multimodal row shape unchanged."""
    import os as _os
    import uuid as _uuid

    from . import scratch_dir

    tune(spark)
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text")
    )
    base = scratch_dir(f"scksde_bin_{_uuid.uuid4().hex[:6]}_")
    # stage blobs sharded by id-bucket (executor-side write via the same
    # Arrow batch path a media exporter uses)
    def write_blobs(batches):
        import pandas as pd

        for pdf in batches:
            names = []
            for r in pdf.itertuples(index=False):
                shard = _os.path.join(base, f"shard={int(r.doc_id) % 4}")
                _os.makedirs(shard, exist_ok=True)
                name = f"doc_{int(r.doc_id):06d}.bin"
                with open(_os.path.join(shard, name), "wb") as f:
                    f.write(str(r.text).encode("utf-8"))
                names.append(name)
            yield pd.DataFrame({"file_name": names})

    d.mapInPandas(write_blobs, schema="file_name string").count()

    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .option("recursiveFileLookup", "true")
        .load(base)
    )
    return blobs.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").cast("long").alias("length"),
        F.md5(F.col("content")).alias("content_md5"),
    )


@query(
    "q_variant_json",
    oracle="""
SELECT etype,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       CAST(COUNT(DISTINCT usr) AS BIGINT) AS n_users
FROM (
  SELECT event_type AS etype,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k,
         user_id AS usr
  FROM events)
GROUP BY etype
""",
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's native VARIANT type:
    the raw JSON props column is parsed ONCE with try_parse_json into
    the binary variant encoding and the payload fields the rollup needs
    come out of typed variant_get path extractions — schema-on-read
    without a fixed from_json schema, tolerant of ragged/evolving
    payloads. The typed envelope columns (event_type, user_id) shred
    straight from the raw columns, so payload validity can never
    regroup a row. The oracle extracts the same values with DuckDB's
    JSON paths, proving the variant path is semantics-neutral.

    Scale: parse_json and variant_get are codegen'd JVM expressions —
    the parse + three typed gets run map-only at scan speed, then ONE
    rollup shuffle. At 100 TB the variant column is the shred-at-ingest
    form: parse once at landing, store binary variant, and every
    downstream query pays typed path gets instead of re-parsing JSON
    text (the Parquet VARIANT logical type ships this layout); the
    all-integer aggregates keep the rollup engine-exact."""
    tune(spark)
    ev = table(spark, sf_dir, "events")
    # Grouping hygiene (ADVICE r7): etype/usr shred straight from the
    # raw typed columns — only the props payload goes through
    # try_parse_json, so a malformed payload degrades k to NULL on that
    # row WITHOUT migrating the row into the NULL group (the oracle
    # groups by the raw event_type regardless of props validity). The
    # coalesce to the JSON literal null keeps a NULL props parseable as
    # a NULL extraction rather than a parse failure.
    v = F.try_parse_json(F.coalesce(F.col("props"), F.lit("null")))
    shredded = ev.select(
        F.col("event_type").alias("etype"),
        F.col("user_id").cast("bigint").alias("usr"),
        F.variant_get(v, "$.k", "bigint").alias("k"),
    )
    return shredded.groupBy("etype").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.max("k").cast("bigint").alias("max_k"),
        F.countDistinct("usr").alias("n_users"),
    )
