"""Incremental corpus curation as a streaming topology.

The batch pipeline (`operators/curation.py::curate`) assumes the whole
corpus is present; real training corpora GROW — crawl shards land over
days. This topology curates incrementally: each micro-batch of arriving
documents passes the same gates, then documents whose content hash
already exists in the CORPUS SINK are dropped (cross-batch exact dedup
without unbounded stream state — the sink itself is the state, exactly
like the reference's idempotent-output pattern).

Scale: per-batch gates are map-only; the dedup anti-join is keyed on
16-byte content digests — the sink side reads ONLY its digest column
(column pruning keeps the probe cheap no matter how wide the corpus
rows are). For very large corpora, partition the sink by digest prefix
so the anti-join prunes partitions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.curation import (
    LANG_GATE_RATIO,
    QUALITY_GATE,
    CurationConfig,
    quality_score,
)
from ..operators.pii import redact_pii
from ..functions.textfns import en_stopword_count, tokens


def _is_path_missing(exc: Exception) -> bool:
    """True ONLY for Spark's path-not-found failure ("first batch: the
    store/sink doesn't exist yet"). Classifies by the exception's stable
    error class where it carries one (PySpark 4 AnalysisException:
    getCondition, né getErrorClass) and falls back to the message check
    only when no class is available — substring-matching the text alone
    is brittle across Spark versions/locales AND would silently treat a
    corrupt-store error that merely MENTIONS those words as empty
    (ADVICE r16)."""
    try:
        from pyspark.errors import AnalysisException
    except ImportError:  # pragma: no cover - ancient pyspark
        AnalysisException = ()  # type: ignore[assignment]
    if isinstance(exc, AnalysisException):
        for getter in ("getCondition", "getErrorClass"):
            fn = getattr(exc, getter, None)
            if fn is None:
                continue
            try:
                cond = fn()
            except Exception:
                continue
            if cond is not None:
                return cond == "PATH_NOT_FOUND"
    return "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc)


DOCUMENTS_FILE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

CURATED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("quality", T.DoubleType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)


@dataclass
class CurationStreamConfig:
    src_dir: str  # documents*.parquet shards arrive here
    out_path: str  # curated corpus sink (parquet append)
    checkpoint: str
    curation: CurationConfig = CurationConfig()
    max_files_per_trigger: int | None = None


def build_curation_stream(spark: SparkSession, cfg: CurationStreamConfig):
    """Returns an unstarted writer factory (StreamRegistry contract).

    Per micro-batch: lang gate -> quality gate -> [PII redact] ->
    in-batch exact dedup (keep min doc_id per content hash) -> anti-join
    against the sink's existing content hashes -> append.
    """
    reader = spark.readStream.schema(DOCUMENTS_FILE_SCHEMA).option(
        "pathGlobFilter", "documents*.parquet"
    )
    if cfg.max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", cfg.max_files_per_trigger)
    src = reader.parquet(cfg.src_dir)

    cc = cfg.curation

    def process(batch: DataFrame, epoch_id: int) -> None:
        cur = batch
        if cc.redact:
            cur = redact_pii(cur, text_col="text")
        if cc.lang_stopword_min is not None:
            toks = tokens(F.col("text"))
            cur = cur.filter(en_stopword_count(toks) / F.size(toks) >= cc.lang_stopword_min)
        cur = cur.withColumn("quality", quality_score(F.col("text")))
        if cc.quality_min is not None:
            cur = cur.filter(F.col("quality") >= cc.quality_min)
        cur = cur.withColumn("content_hash", F.md5("text"))
        # in-batch exact dedup: keep the smallest doc_id per content hash
        # (min is deterministic under replay, unlike first/arbitrary)
        cur = (
            cur.groupBy("content_hash")
            .agg(
                F.min_by(F.struct("doc_id", "text", "quality"), "doc_id").alias("__r")
            )
            .select("__r.doc_id", "__r.text", "__r.quality", "content_hash")
        )
        # cross-batch dedup: the sink IS the state — probe only its
        # digest column (pruned scan)
        spark_l = batch.sparkSession
        try:
            seen = spark_l.read.schema(CURATED_SCHEMA).parquet(cfg.out_path).select(
                "content_hash"
            )
            cur = cur.join(seen, "content_hash", "left_anti")
        except Exception as exc:
            if not _is_path_missing(exc):
                raise  # first batch: sink doesn't exist yet
        cur.select("doc_id", "text", "quality", "content_hash").write.mode(
            "append"
        ).parquet(cfg.out_path)

    def start():
        return (
            src.writeStream.outputMode("append")
            .option("checkpointLocation", cfg.checkpoint)
            .foreachBatch(process)
            .start()
        )

    return start


def read_curated(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.schema(CURATED_SCHEMA).parquet(out_path)


def funnel_partials(
    batch: DataFrame, epoch: int, digest_store: str, rollup: str
) -> None:
    """Per-micro-batch kernel of s_curation_funnel (queries/streaming.py):
    compute the batch's stage-survival partials (rows, lang-gate
    survivors, quality-gate survivors, NEWLY-admitted distinct digests
    vs the accumulated digest store) and commit both the digests and the
    1-row partial through batch-id-keyed DYNAMIC PARTITION OVERWRITE —
    so a checkpoint-recovery replay of a half-committed epoch recomputes
    the same counts (the seen-set excludes the epoch's own partition)
    and rewrites its own partitions in place. Module-level so the
    replay-idempotency contract is directly testable."""
    s = batch.sparkSession
    toks = tokens(F.col("text"))
    en_ratio = en_stopword_count(toks) / F.size(toks)
    flags = batch.select(
        (en_ratio >= LANG_GATE_RATIO).alias("lang_ok"),
        (quality_score(F.col("text")) >= QUALITY_GATE).alias("q_ok"),
        F.md5("text").alias("h"),
    ).persist()
    counts = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum(F.when(F.col("lang_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("k1"),
        F.sum(F.when(F.col("lang_ok") & F.col("q_ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("k2"),
    ).collect()[0]
    kept = flags.filter(F.col("lang_ok") & F.col("q_ok")).select("h").distinct()
    try:
        # exclude THIS epoch's partition: a replay of a half-committed
        # batch must not see its own prior attempt. Explicit schema: an
        # EXISTING-but-empty store (pre-created dir) reads as zero rows
        # instead of failing schema inference.
        seen = (
            s.read.schema("h string, batch_id long")
            .parquet(digest_store)
            .filter(F.col("batch_id") != epoch)
        )
        new = kept.join(seen.select("h"), "h", "left_anti")
    except Exception as exc:
        # ONLY path-not-found means "first batch: no store yet". Any other
        # read failure (corrupt store, permissions) must surface — treating
        # it as empty would skip the seen-set and silently overcount k3
        # (ADVICE r15; error-class-first classification per ADVICE r16).
        if not _is_path_missing(exc):
            raise
        new = kept
    new = new.persist()
    n_new = new.count()
    (
        new.withColumn("batch_id", F.lit(epoch).cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(digest_store)
    )
    from ..catalog import local_rows

    (
        local_rows(
            s,
            [(int(counts["total"]), int(counts["k1"]),
              int(counts["k2"]), int(n_new), int(epoch))],
            "total long, k1 long, k2 long, k3 long, batch_id long",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(rollup)
    )
    new.unpersist()
    flags.unpersist()


def dup_timeline_partials(
    batch: DataFrame, epoch: int, cells_store: str, n: int
) -> None:
    """Per-micro-batch kernel of s_dup_timeline (queries/streaming.py):
    the arriving crawl slice's per-digest partial — occurrence count and
    the slice-global minimum attribution key ``slice_id * n + doc_id``
    (``n`` = corpus max_id + 1, the same total order the batch query
    states) — committed batch-id-keyed through dynamic partition
    overwrite. The slice identity comes from the batch's OWN
    ``slice_id`` data column (stamped when the slice is written), never
    from the micro-batch counter: with id gaps, an empty slice, or the
    file source merging two landed slices into one trigger, batch ids
    diverge from slice ids and counter-derived attribution keys would
    silently misattribute (ADVICE r16). ``batch_id`` is ONLY the
    replay-overwrite partition key. A pure function of the batch, so
    checkpoint-recovery replays rewrite their own partition in place
    (the mix_partials contract); first-occurrence attribution happens
    at READ time over all partials, so no cross-batch state is carried
    here at all."""
    cells = batch.groupBy("slice_id", F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.min(F.col("slice_id").cast("bigint") * F.lit(int(n)) + F.col("doc_id"))
        .cast("bigint")
        .alias("key"),
    )
    (
        cells.withColumn("batch_id", F.lit(epoch).cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(cells_store)
    )


def decon_partials(
    batch: DataFrame, epoch: int, bench_store: str, out_store: str
) -> None:
    """Per-micro-batch kernel of s_decontaminate (queries/streaming.py):
    flag the arriving crawl slice's documents that share any token
    n-gram with the FROZEN benchmark gram store (the eval suite is
    fixed up front — the store is written once, read back per batch
    with an explicit schema and broadcast onto the batch's md5'd
    grams), and commit each batch's contaminated-doc rows keyed by
    batch id through dynamic partition overwrite. A pure function of
    (batch, frozen bench store), so checkpoint-recovery replays rewrite
    their own partition in place; a document's grams all live in its
    own batch, so per-doc counts never need cross-batch state."""
    from ..operators.curation import _gram_hashes
    from ..queries.curation import DECON_N

    s = batch.sparkSession
    bench = s.read.schema("gh string, bench_doc long").parquet(bench_store)
    grams = _gram_hashes(batch, DECON_N, "doc_id", "text").withColumnRenamed(
        "__gh", "gh"
    )
    contaminated = (
        grams.join(F.broadcast(bench), "gh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gh").cast("bigint").alias("n_shared_ngrams"),
            F.countDistinct("bench_doc").cast("bigint").alias("n_bench_docs"),
        )
    )
    (
        contaminated.withColumn("batch_id", F.lit(epoch).cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_store)
    )


def importance_partials(batch: DataFrame, epoch: int, feat_store: str) -> None:
    """Per-micro-batch kernel of s_importance_select
    (queries/streaming.py): FEATURIZE the arriving corpus slice into
    hashed-bucket counts — one combinable groupBy(doc_id, bucket) over
    the slice via the SHARED token_bucket feature map — and commit the
    (doc_id, b, cnt) partial keyed by batch id through dynamic
    partition overwrite. The featurized store IS DSIR's hashed-feature
    representation of the corpus (sparse integer count vectors,
    ~16 B/pair); scoring happens at READ time against the frozen
    target store because the bucket ratios depend on FULL-corpus
    totals, which only exist once all slices have landed — committing
    scores per batch would bake in a partial denominator. A pure
    function of the batch (a doc's tokens all live in its own slice),
    so checkpoint-recovery replays rewrite their own partition in
    place; no cross-batch state."""
    from ..queries.curation import token_bucket

    feats = (
        batch.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .select("doc_id", token_bucket(F.col("tok")).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    (
        feats.withColumn("batch_id", F.lit(epoch).cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(feat_store)
    )


def mix_partials(batch: DataFrame, epoch: int, cells_store: str) -> None:
    """Per-micro-batch kernel of s_source_mix_drift
    (queries/streaming.py): one combinable groupBy(slice_id, source)
    count of the arriving crawl slice, committed batch-id-keyed through
    dynamic partition overwrite. The slice identity comes from the
    batch's OWN ``slice_id`` data column (stamped when the slice is
    written) — never the micro-batch counter, which diverges from slice
    ids under id gaps, empty slices, or multi-file triggers (ADVICE
    r16); ``batch_id`` is ONLY the replay-overwrite partition key. A
    pure function of the batch, so a checkpoint-recovery replay
    recomputes identical counts and rewrites its own partition in place
    (the funnel_partials contract, without the cross-batch seen-set —
    mixture cells are independent per slice). Module-level so the
    replay contract is directly testable."""
    counts = batch.groupBy("slice_id", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    (
        counts.withColumn("batch_id", F.lit(epoch).cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(cells_store)
    )
