"""Temporal operators Spark lacks natively: as-of join, sessionization.

As-of join (point-in-time lookup): Spark has no ASOF JOIN operator, so we
compose one from built-ins with the union+window technique:
  1. normalize both sides to (key, t, payload, side-marker),
  2. union, sort within key by (t, marker) — right-side rows sort before
     same-timestamp left rows, giving >= ("backward") semantics,
  3. last(payload, ignorenulls) over rows-unbounded-preceding carries the
     most recent right-side payload forward,
  4. keep left rows.
One shuffle on the key (same as any join), no range explosion, no
pairwise scan — this is the standard scale-out as-of pattern and is how
it should run at 100 TB (vs merge_asof per group in Pandas, which would
bottleneck on Python).

Sessionization: classic gap-based session ids via lag + running sum of
session-break flags — two window passes over one shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """For each left row: the right row with the greatest right_time <=
    left_time within the same key (backward as-of, inclusive).

    `right` must be unique per (key, right_time) — pre-dedup with
    latest-wins if needed (ties would make the result nondeterministic).
    Payload columns are returned as `asof_<name>` (null when no match).
    """
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    )
    lcols = left.columns
    l_ = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *lcols,
    )
    u = r.select("__k", "__t", "__side", "__payload", *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols]).unionByName(l_)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__asof", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in payload_cols]
    )
    return out


def sessionize(
    df: DataFrame,
    key: str,
    time_col: str,
    gap: Column,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign gap-based session ids per key.

    `gap` is a Column of the max intra-session silence in MICROSECONDS
    (exact integer arithmetic — engine-portable, no interval types).
    Adds `session_id` (1-based per key).
    """
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in order_tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # unix_micros requires TIMESTAMP_LTZ; the cast from NTZ interprets the
    # wall clock in the session timezone (pinned to UTC by session.tune),
    # so it is value-preserving for either timestamp flavor.
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    prev_us = F.lag(t_us).over(w)
    is_new = F.when(prev_us.isNull() | ((t_us - prev_us) > gap), 1).otherwise(0)
    return df.withColumn("session_id", F.sum(is_new).over(run).cast("bigint"))
