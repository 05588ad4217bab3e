"""Data-layout query surface: Z-order clustering for multi-column file
skipping.

Generalizes the reference's single-key physical layout (Kafka topics
partitioned by record key — one clustering dimension) to the analytic
engine's need: scans filtered by MORE than one column. A single-column
sort gives parquet min/max pruning on that column only; the Morton
(Z-order) interleave bounds EVERY indexed column's value range per file
— the clustering primitive behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Determinism: bucket encoding and bit interleave are integer/IEEE-exact
expressions restated verbatim in the DuckDB oracle; no sampling, no
rank — the file assignment is a pure function of the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.layout import min_max_bucket, z_file_id, z_value
from ..session import tune
from . import query

Z_BITS = 16
N_FILES = 64  # 6 z-prefix bits -> top 3 bits of EACH dimension fixed per file


def _bucket_sql(col: str, lo: str, hi: str) -> str:
    span = f"(CASE WHEN {hi} > {lo} THEN {hi} - {lo} ELSE 1.0 END)"
    scaled = (
        f"CAST(FLOOR(((CAST({col} AS DOUBLE) - {lo}) / {span}) * "
        f"{(1 << Z_BITS) - 1}) AS BIGINT)"
    )
    return f"GREATEST(0, LEAST({(1 << Z_BITS) - 1}, {scaled}))"


def _interleave_sql(a: str, b: str) -> str:
    # bit i of each bucket -> z bit i*2 (col a) / i*2+1 (col b); matches
    # operators.layout.z_value([a, b], Z_BITS) exactly.
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {i * 2})")
        terms.append(f"((({b} >> {i}) & 1) << {i * 2 + 1})")
    return " | ".join(terms)


def _zorder_oracle() -> str:
    shift = 2 * Z_BITS - max(1, N_FILES - 1).bit_length()
    return f"""
WITH g AS (
  SELECT MIN(CAST(o_custkey AS DOUBLE)) AS lo_a, MAX(CAST(o_custkey AS DOUBLE)) AS hi_a,
         MIN(CAST(o_totalprice AS DOUBLE)) AS lo_b, MAX(CAST(o_totalprice AS DOUBLE)) AS hi_b
  FROM orders
), b AS (
  SELECT o_orderkey,
         {_bucket_sql('o_custkey', 'lo_a', 'hi_a')} AS ba,
         {_bucket_sql('o_totalprice', 'lo_b', 'hi_b')} AS bb
  FROM orders CROSS JOIN g
), z AS (
  SELECT o_orderkey, ({_interleave_sql('ba', 'bb')}) AS z_val FROM b
)
SELECT o_orderkey, z_val, CAST(z_val >> {shift} AS INT) AS file_id FROM z
"""


@query("q_zorder_layout", oracle=_zorder_oracle(), bench=True)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout assignment over orders on (o_custkey,
    o_totalprice): min/max-bucket both columns to 16 bits (bounds from a
    1-row broadcast aggregate — no collect), interleave into a 32-bit
    Morton code, and take the top 6 bits as the file id — every file
    then spans at most 1/8 of BOTH dimensions, so a selective filter on
    either column skips ~7/8 of the files (pinned by
    ``test_zorder_bounds_both_dims_per_file``).

    Scale: the z-value is pure codegen'd bit arithmetic on the scan (the
    1-row bounds aggregate is the only pre-pass); the clustered write is
    `repartitionByRange(n, z).sortWithinPartitions(z)` — one range
    shuffle, the same cost as any sorted write, paid once at ingest and
    amortized over every subsequent multi-predicate scan.
    """
    tune(spark)
    o = table(spark, sf_dir, "orders")
    g = o.agg(
        F.min(F.col("o_custkey").cast("double")).alias("lo_a"),
        F.max(F.col("o_custkey").cast("double")).alias("hi_a"),
        F.min(F.col("o_totalprice").cast("double")).alias("lo_b"),
        F.max(F.col("o_totalprice").cast("double")).alias("hi_b"),
    )
    ba = min_max_bucket(F.col("o_custkey"), F.col("lo_a"), F.col("hi_a"), Z_BITS)
    bb = min_max_bucket(F.col("o_totalprice"), F.col("lo_b"), F.col("hi_b"), Z_BITS)
    z = z_value([ba, bb], Z_BITS)
    return (
        o.crossJoin(F.broadcast(g))
        .select("o_orderkey", z.alias("z_val"))
        .select(
            "o_orderkey",
            "z_val",
            z_file_id(F.col("z_val"), 2 * Z_BITS, N_FILES).alias("file_id"),
        )
    )


COMPACT_TARGET_BYTES = 64 * 1024  # toy-scale target; production: 512 MB


@query(
    "q_compaction_plan",
    oracle=f"""
WITH files AS (
  SELECT l_returnflag AS part_key,
         CAST(l_orderkey % 40 AS INT) AS file_id,
         CAST(COUNT(*) * 64 AS BIGINT) AS file_bytes
  FROM lineitem
  GROUP BY l_returnflag, l_orderkey % 40
), planned AS (
  SELECT part_key, file_id, file_bytes,
         CAST((SUM(file_bytes) OVER (PARTITION BY part_key ORDER BY file_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - file_bytes) // {COMPACT_TARGET_BYTES} AS INT) AS target_file
  FROM files
)
SELECT part_key, file_id, file_bytes, target_file,
       CAST(COUNT(*) OVER (PARTITION BY part_key, target_file) AS BIGINT) AS n_merged
FROM planned
""",
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the OPTIMIZE maintenance pass
    every streaming sink needs (micro-batches leave many small files;
    scan cost is per-file overhead x file count). Per partition, files
    are bin-packed into target-size output groups by a running-sum
    window: target_file = floor((cumulative bytes BEFORE this file) /
    target). Deterministic (ordered by file id), single-pass, and the
    executor that rewrites group G reads exactly its files — no driver
    loop, no all-file listing on one node. File stats are synthesized
    from lineitem here; on a real table they come from the table
    format's manifest (or a LIST + size pass).

    Scale: planning cost is one window over the FILE-STATS relation
    (millions of rows for billions of data rows); the rewrite itself is
    a partition-pruned read per group. This is exactly Delta/Iceberg
    OPTIMIZE's planning shape, as a query."""
    tune(spark)
    li = table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.col("l_returnflag").alias("part_key"),
        (F.col("l_orderkey") % 40).cast("int").alias("file_id"),
    ).agg((F.count(F.lit(1)) * 64).cast("bigint").alias("file_bytes"))
    w = (
        Window.partitionBy("part_key")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = files.withColumn(
        "target_file",
        F.floor(
            (F.sum("file_bytes").over(w) - F.col("file_bytes"))
            / COMPACT_TARGET_BYTES
        ).cast("int"),
    )
    wg = Window.partitionBy("part_key", "target_file")
    return planned.select(
        "part_key", "file_id", "file_bytes", "target_file",
        F.count(F.lit(1)).over(wg).cast("bigint").alias("n_merged"),
    )


# probe predicate for the zone-map audit: a selective custkey band plus a
# price floor — the multi-column filter shape z-ordering exists to serve
ZM_CUST_LO, ZM_CUST_HI = 100.0, 300.0
ZM_PRICE_LO = 150_000.0


def _zone_map_oracle() -> str:
    shift = 2 * Z_BITS - max(1, N_FILES - 1).bit_length()
    return f"""
WITH g AS (
  SELECT MIN(CAST(o_custkey AS DOUBLE)) AS lo_a, MAX(CAST(o_custkey AS DOUBLE)) AS hi_a,
         MIN(CAST(o_totalprice AS DOUBLE)) AS lo_b, MAX(CAST(o_totalprice AS DOUBLE)) AS hi_b
  FROM orders
), b AS (
  SELECT o_custkey, o_totalprice,
         {_bucket_sql('o_custkey', 'lo_a', 'hi_a')} AS ba,
         {_bucket_sql('o_totalprice', 'lo_b', 'hi_b')} AS bb
  FROM orders CROSS JOIN g
), f AS (
  SELECT o_custkey, o_totalprice,
         CAST(({_interleave_sql('ba', 'bb')}) >> {shift} AS INT) AS file_id
  FROM b
), zm AS (
  SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
         MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
  FROM f GROUP BY file_id
)
SELECT file_id, n_rows, min_cust, max_cust, min_price, max_price,
       NOT (max_cust >= {ZM_CUST_LO} AND min_cust <= {ZM_CUST_HI}
            AND max_price >= {ZM_PRICE_LO}) AS can_skip
FROM zm
"""


@query("q_zone_map_skip", oracle=_zone_map_oracle())
def q_zone_map_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map audit of the Z-order layout: per assigned file, the
    min/max statistics a parquet footer would carry for BOTH clustered
    columns, plus whether a fixed multi-column probe (custkey band +
    price floor) could skip the file entirely. This is the measurement
    half of q_zorder_layout — the layout claims "every file spans at
    most 1/8 of both dimensions"; this query computes the actual spans
    and turns them into the skip decision the scan layer would make
    (file overlaps the probe iff [min,max] intersects it on EVERY
    predicate column; otherwise the footer read is the only I/O).

    Scale: one pass computes file assignment (pure codegen'd bit
    arithmetic after a 1-row bounds broadcast) and one combinable
    groupBy(file_id) folds min/max/count — the same cost as writing the
    layout's footer stats at ingest. min/max carry no accumulation-order
    sensitivity, so the audit is engine-exact without the decimal
    detour. At 100 TB the output is |files| rows — the planner-side
    pruning table, not data."""
    tune(spark)
    o = table(spark, sf_dir, "orders")
    g = o.agg(
        F.min(F.col("o_custkey").cast("double")).alias("lo_a"),
        F.max(F.col("o_custkey").cast("double")).alias("hi_a"),
        F.min(F.col("o_totalprice").cast("double")).alias("lo_b"),
        F.max(F.col("o_totalprice").cast("double")).alias("hi_b"),
    )
    ba = min_max_bucket(F.col("o_custkey"), F.col("lo_a"), F.col("hi_a"), Z_BITS)
    bb = min_max_bucket(F.col("o_totalprice"), F.col("lo_b"), F.col("hi_b"), Z_BITS)
    z = z_value([ba, bb], Z_BITS)
    zm = (
        o.crossJoin(F.broadcast(g))
        .select(
            "o_custkey",
            "o_totalprice",
            z_file_id(z, 2 * Z_BITS, N_FILES).alias("file_id"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
    overlaps = (
        (F.col("max_cust") >= ZM_CUST_LO)
        & (F.col("min_cust") <= ZM_CUST_HI)
        & (F.col("max_price") >= ZM_PRICE_LO)
    )
    return zm.select(
        "file_id", "n_rows", "min_cust", "max_cust", "min_price", "max_price",
        (~overlaps).alias("can_skip"),
    )
