"""Distributed exact global rank — no single-partition sort.

The anti-pattern this replaces: ``Window.orderBy(...)`` with no
partitionBy pulls the entire relation through ONE task (Spark even logs
"No Partition Defined for Window operation"). Exact global ranks don't
need that; they need exactly what Spark's own global-sort planner does:

  1. deterministic range-bucket boundaries from one ``approx_percentile``
     aggregate over the leading order column (KLL sketch — no sampling
     randomness, so every scan of the plan sees the identical bucket
     assignment; sketch accuracy only affects bucket BALANCE, never
     correctness, because any monotone bucketing yields the same ranks);
  2. per-bucket ``row_number`` — the sort runs partitioned
     (``hashpartitioning(__rank_bucket)``), each partition ~N/buckets;
  3. global rank = broadcast cumulative bucket offset + local rank.

The only single-partition work is the |buckets|-row offsets window.

Degenerate-skew caveat: boundaries are drawn from the leading column
only (so equal keys never straddle buckets); a single value holding
> 1/n_buckets of the mass concentrates its bucket — raise ``n_buckets``
or pre-split ties on a secondary column at extreme scale.

Used by ``q_quantile_bins`` (queries/analytic.py) and
``q_perplexity_filter`` (queries/text.py); plan-pinned in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__rank_bucket"


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int = 32,
    accuracy: int = 10_000,
    rank_col: str = "rank",
    total_col: str = "total",
) -> DataFrame:
    """Add exact 1-based global-rank and total-count columns for the
    total order given by ``order_cols`` (which must be unique per row —
    include a key as the final tiebreak), without a single-partition
    sort. ``order_cols[0]`` must be numeric (it feeds the
    approx_percentile boundary sketch).

    The input is consumed THREE times (boundary sketch, local rank,
    bucket counts): callers whose ``df`` sits on an expensive lineage
    should persist it first — it is one row per ranked entity, so the
    cache is small (q_perplexity_filter measured 3.35 s → 2.7 s from
    exactly this)."""
    lead = order_cols[0]
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.agg(
        F.approx_percentile(lead, F.lit(probs), F.lit(accuracy)).alias("c")
    ).head()["c"]
    bucket = F.lit(0)
    for i, c in enumerate(sorted(cuts or [])):
        bucket = F.when(F.col(lead) <= F.lit(c), bucket).otherwise(F.lit(i + 1))
    # NULL lead values: the <= chain is NULL (falsy) at every level and
    # would fall through to the LAST bucket, but the per-bucket
    # row_number (and the single-sort semantics this operator replaces)
    # order NULLs FIRST under ascending sort — route them to bucket 0 so
    # global ranks match a true global ascending sort.
    bucket = F.when(F.col(lead).isNull(), F.lit(0)).otherwise(bucket)
    bucketed = df.withColumn(_BUCKET, bucket)

    local_w = Window.partitionBy(_BUCKET).orderBy(*order_cols)
    ranked_local = bucketed.withColumn("__rn", F.row_number().over(local_w))

    counts = bucketed.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("__cnt"))
    w_prev = Window.orderBy(_BUCKET).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(_BUCKET).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        _BUCKET,
        F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_all).alias(total_col),
    )
    return (
        ranked_local.join(F.broadcast(offsets), _BUCKET)
        .withColumn(rank_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop(_BUCKET, "__rn", "__off")
    )
