"""Changelog materialization: Debezium change streams -> tables.

The reference ships changes downstream but never materializes state; a
real CDC engine needs both directions. Two operators:

- ``materialize_changelog``: changelog (c/u/d ops per key) -> current
  snapshot. Latest-wins per key (deterministic tiebreaks), then deletes
  drop the key. This is MERGE INTO / upsert semantics composed from
  window + filter (the guide's "emulate with anti-join + union / window"
  pattern) — one shuffle on the key, no per-row driver logic, safe at any
  scale.
- ``scd2_intervals``: changelog -> slowly-changing-dimension type-2
  history: every change becomes a validity interval [valid_from,
  valid_to) via lead() per key; the open interval is the current row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def materialize_changelog(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "d",
) -> DataFrame:
    """Apply a change stream to an empty state: keep each key's latest
    change (by order_cols desc), drop keys whose latest change is a
    delete. Returns current-state rows (op column removed)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("__rn", op_col)
    )


def scd2_intervals(
    changes: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """SCD2 history: each change row gets [valid_from, valid_to) with
    valid_to = next change's time (null = still current) + is_current."""
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changes.withColumn("valid_from", F.col(time_col))
        .withColumn("valid_to", F.lead(time_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_merge(
    current: DataFrame | None,
    changes: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Incrementally fold a batch of changes into an SCD2 table: keys
    untouched by the batch pass through by ANTI join; each touched key's
    full history (existing intervals converted back to changes, plus the
    new batch) re-derives through :func:`scd2_intervals`. Recompute scope
    is |touched keys|' history + the batch — never the dimension — and a
    LATE change for a touched key lands in the right interval because
    the key rebuilds from scratch.

    ``current`` is a prior output of this function / :func:`scd2_intervals`
    (the change columns, ``time_col`` included, plus
    valid_from/valid_to/is_current), or None for the first batch.
    Invariant (property-tested): folding any split of a changelog
    batch-by-batch equals one-shot ``scd2_intervals`` over the whole
    changelog.
    """
    change_cols = list(changes.columns)
    if current is None:
        return scd2_intervals(changes, key_cols, time_col, tiebreak_cols)
    keys = list(key_cols)
    touched = changes.select(*keys).distinct()
    untouched = current.join(touched, keys, "left_anti")
    hist = current.join(touched, keys, "left_semi").select(*change_cols)
    rebuilt = scd2_intervals(
        hist.unionByName(changes.select(*change_cols)), keys, time_col, tiebreak_cols
    )
    return untouched.unionByName(rebuilt.select(*untouched.columns))
