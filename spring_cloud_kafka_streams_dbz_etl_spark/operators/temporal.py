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


def interval_overlap_pairs(
    iv: DataFrame,
    key: str,
    id_col: str,
    start: str,
    end: str,
    cell_days: int,
    epoch: str = "1992-01-01",
) -> DataFrame:
    """Big-big interval OVERLAP self-join via grid-cell bucketing — the
    shape neither the broadcast range join (small dim) nor the as-of
    join (latest-before) covers: one large relation of (key, id,
    start-date, end-date) intervals, find every same-key pair that
    overlaps (a.s <= b.e AND b.s <= a.e).

    A naive same-key self-join is quadratic in per-key rows and dies on
    hot keys. Instead each interval EXPLODES to the ``cell_days``-wide
    grid cells it spans (fan-out <= span/cell_days + 1), the join runs
    as a pure EQUI join on (key, cell) — shuffle partitions bounded by
    per-(key, cell) co-occurrence, never per-key totals — and each
    qualifying pair is emitted EXACTLY ONCE at its ownership cell (the
    cell containing the overlap's start = max of the two starts), so no
    post-hoc distinct pass is needed. Cell width tunes fan-out vs
    per-cell occupancy exactly like LSH band width.

    Returns one row per overlapping pair:
    (key, a_id, b_id, a_s, a_e, b_s, b_e) with a_id < b_id.
    Completeness/uniqueness property-tested against the quadratic join
    (`test_interval_overlap_grid_equals_bruteforce`); the crossover vs
    the naive join is measured in `tools/measure_interval.py`.
    """
    ep = F.lit(epoch).cast("date")

    def cell_of(c: Column) -> Column:
        return F.floor(F.datediff(c, ep) / cell_days)

    cells = iv.withColumn(
        "__cell", F.explode(F.sequence(cell_of(F.col(start)), cell_of(F.col(end))))
    )
    a = cells.select(
        F.col(key).alias("__k"), "__cell",
        F.col(id_col).alias("a_id"), F.col(start).alias("a_s"), F.col(end).alias("a_e"),
    )
    b = cells.select(
        F.col(key).alias("__k"), "__cell",
        F.col(id_col).alias("b_id"), F.col(start).alias("b_s"), F.col(end).alias("b_e"),
    )
    return (
        a.join(b, ["__k", "__cell"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
            # ownership: count the pair only in the cell where its overlap starts
            & (F.col("__cell") == cell_of(F.greatest(F.col("a_s"), F.col("b_s"))))
        )
        .select(
            F.col("__k").alias(key),
            "a_id", "b_id", "a_s", "a_e", "b_s", "b_e",
        )
    )
