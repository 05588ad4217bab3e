"""Data-layout operators: Z-order (Morton) multi-dimensional clustering.

At 100 TB the scan layer wins or loses on file skipping: parquet
min/max statistics prune row groups only when rows with nearby values
are physically adjacent. A single-column sort gives perfect pruning on
that column and NONE on any other; interleaving the bits of several
columns (the Z-order / Morton curve) gives every indexed column a
bounded value range per file — each file covers a small hyper-rectangle
of the key space, so a selective filter on ANY of the z-ordered columns
skips most files. This is the clustering primitive behind
Delta/Iceberg `OPTIMIZE ZORDER BY`.

Everything here is integer bit arithmetic in built-in expressions
(shiftleft/or/bitwise ops in whole-stage codegen) — exactly mirrorable
in oracle SQL, zero Python, zero shuffle for the z-value itself; the
clustered WRITE is one range repartition on the z-value (the same
single shuffle a plain sort-write costs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integral)
    column into one Morton code: output bit ``i*len(cols)+j`` is bit
    ``i`` of ``cols[j]``. Columns must already be rank/bucket-encoded to
    [0, 2^bits); clamp upstream. 2 cols x 16 bits -> 32-bit code.

    Pure bit arithmetic (shiftright/&1/shiftleft chains) — codegen'd,
    deterministic, engine-portable.
    """
    n = len(cols)
    out: Column | None = None
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftleft(
                F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)),
                i * n + j,
            )
            out = bit if out is None else out.bitwiseOR(bit)
    assert out is not None
    return out


def min_max_bucket(c: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Scale a numeric column into [0, 2^bits) given its min/max (as
    columns so they can come from a 1-row broadcast aggregate): the
    rank-free encoding for z-ordering continuous values."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (c.cast("double") - lo) / span
    scaled = F.floor(frac * ((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), scaled))


def z_file_id(zcol: Column, total_bits: int, n_files: int) -> Column:
    """Map a z-value to its file: the top log2(n_files) bits of the
    code. Each file is then one contiguous z-range — a union of small
    hyper-rectangles in the original key space, which is what bounds
    every z-ordered column's min/max per file (the file-skipping
    property). Map-only and deterministic, unlike sampled
    repartitionByRange boundaries; production writes
    `df.repartitionByRange(n, zcol).sortWithinPartitions(zcol)` and gets
    the same clustering with balanced file sizes (one range shuffle,
    the cost of any sorted write).

    The id space rounds ``n_files`` UP to the next power of two: ids lie
    in [0, 2^ceil(log2(n_files))), so a non-power-of-two request (e.g.
    65) may yield up to ~2x more distinct ids (128) than asked. Pass a
    power of two for an exact file count (callers in this repo do), or
    use the repartitionByRange form above when an exact count matters.
    """
    shift = total_bits - max(1, n_files - 1).bit_length()
    if shift < 0:
        raise ValueError(f"n_files={n_files} needs more than {total_bits} z bits")
    return F.shiftright(zcol, shift).cast("int")


def assign_shards_handle(
    df: DataFrame, target_chars: int, n_parts: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """assign_shards plus the persisted range-partitioned intermediate as
    an explicit release handle: ``(assigned, parted)``. The intermediate
    MUST stay cached until the caller's last action over ``assigned``
    (the pass-1 offsets are keyed by its frozen partition ids — see
    assign_shards), after which the caller releases it with
    ``parted.unpersist()`` (write_shards' try/finally is the model).
    Loop callers (fuzzers, property tests, measurement sweeps) use this
    form so repeated calls don't accumulate cached blocks for the
    session (ADVICE r15)."""
    spark = df.sparkSession
    n = n_parts or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parted = (
        df.repartitionByRange(n, "source", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # pass 1: control-plane-sized per-(partition, source) mass
    sums = (
        parted.groupBy("_pid", "source")
        .agg(F.sum("n_chars").cast("bigint").alias("chars"))
        .collect()
    )
    offsets: dict[str, int] = {}
    rows = []
    for r in sorted(sums, key=lambda r: (r["source"], r["_pid"])):
        rows.append((r["_pid"], r["source"], offsets.get(r["source"], 0)))
        offsets[r["source"]] = offsets.get(r["source"], 0) + r["chars"]
    odf = spark.createDataFrame(rows, "_pid int, source string, _offset long")
    w = (
        Window.partitionBy("_pid", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    assigned = (
        parted.join(F.broadcast(odf), ["_pid", "source"])
        .withColumn(
            "_cum_before",
            (F.col("_offset") + F.sum("n_chars").over(w) - F.col("n_chars"))
            .cast("bigint"),
        )
        .withColumn(
            "shard_id", F.expr(f"_cum_before DIV {int(target_chars)}")
        )
        .drop("_pid", "_offset", "_cum_before")
    )
    return assigned, parted


def assign_shards(
    df: DataFrame,
    target_chars: int,
    n_parts: int | None = None,
) -> DataFrame:
    """Batch shard assignment: stamp every document with
    ``shard_id = chars_before_it_in_(source, doc_id)_order DIV target``
    — the batch twin of the streaming assigner
    (streaming/stateful.py::running_shard_assign), realizing the file
    fan-out q_shard_plan prices (queries/layout.py::q_shard_plan).

    The naive plan — ``Window.partitionBy("source")`` over the whole
    corpus — funnels EVERY row of a source through one reducer (a 5 TB
    task per source at 100 TB). This is instead a two-pass distributed
    prefix scan:

    1. range-repartition by (source, doc_id) — each task holds a
       contiguous slice of one-or-more sources — and persist, freezing
       the (sampled, hence otherwise job-unstable) partition boundaries;
    2. aggregate per-(partition, source) char sums and collect them —
       CONTROL-PLANE-sized: n_partitions x |sources| rows, a few KB at
       any corpus size;
    3. prefix-sum those on the driver into per-(partition, source)
       offsets, broadcast-join them back, and close with a window keyed
       on (partition, source) — every window group is at most one
       partition's slice of one source, so reducer load stays bounded
       by the shuffle partition size regardless of source skew.

    The result is deterministic even though range boundaries are
    sampled: offset + local-cumsum is boundary-independent. Callers that
    run multiple actions over the result benefit from the persisted
    intermediate; it stays cached for the session, so one-shot callers
    should prefer write_shards (which releases it in a try/finally) and
    loop callers assign_shards_handle (explicit unpersist handle)."""
    assigned, _ = assign_shards_handle(df, target_chars, n_parts)
    return assigned


def write_shards(
    df: DataFrame,
    path: str,
    target_chars: int,
    n_parts: int | None = None,
) -> None:
    """Execute the shard plan end-to-end: assign shard ids, then write
    ONE file per (source, shard_id). The write repartitions by the
    shard key — all rows of a shard land in exactly one task, and
    partitionBy emits one file per key-directory per task, so
    |files| == |distinct (source, shard_id)|. Each shard holds
    ~target_chars of text by construction (a shard's char mass is
    < target + the largest doc that crosses its boundary; docs larger
    than the target leave EMPTY ids behind them — q_shard_plan's
    n_oversize_docs prices exactly those, chunk them upstream via
    q_doc_chunks). Balanced by design: every write task carries
    ~target_chars, so the write shuffle cannot skew no matter how
    skewed the sources are."""
    assigned, parted = assign_shards_handle(df, target_chars, n_parts)
    try:
        (
            assigned.repartition("source", "shard_id")
            .sortWithinPartitions("source", "shard_id", "doc_id")
            .write.partitionBy("source", "shard_id")
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        parted.unpersist()
