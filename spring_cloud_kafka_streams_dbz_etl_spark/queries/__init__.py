"""Declared query surface: name -> (Spark callable, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2B) registers here via the
``@query`` decorator; ``__spark_entry__.py`` re-exports the registry to the
driver. Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = False  # part of the headline bench set


_REGISTRY: dict[str, QuerySpec] = {}

# Per-query persisted intermediates (blocked self-joins, multi-consumer
# explodes). The driver/bench run queries sequentially in one session, so
# each query releases the PREVIOUS query's cached blocks on entry — caches
# never accumulate across the 80+ query sweep (they'd otherwise pile up
# executor memory; the previous query's result is always materialized
# before the next one runs).
_SCOPED_CACHE: list[DataFrame] = []


def cache_scoped(df: DataFrame) -> DataFrame:
    """persist() with query-scoped lifetime (released when the next
    registered query starts)."""
    df = df.persist()
    _SCOPED_CACHE.append(df)
    return df


def release_scoped() -> None:
    while _SCOPED_CACHE:
        try:
            _SCOPED_CACHE.pop().unpersist()
        except Exception:
            pass


def round_half_up6(x: float) -> float:
    """Round to 6 decimals, half away from zero, on the value's shortest
    decimal repr — the repo's cross-engine rounding policy. DuckDB's
    ROUND(double, 6) rounds the shortest-repr decimal half-away
    (probed: 2.0000025 -> 2.000003, 0.1234565 -> 0.123457), while
    Python's built-in round() is half-to-even — a decimal tie would
    hash-mismatch. Driver-side control-plane twin of F.round/HALF_UP."""
    import decimal

    return float(
        decimal.Decimal(repr(float(x))).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def query(name: str, oracle: str | None = None, bench: bool = False):
    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_scoped()
            return fn(spark, sf_dir)

        _REGISTRY[name] = QuerySpec(fn=wrapped, oracle=oracle, bench=bench)
        return wrapped

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import for registration side effects (idempotent).
    from . import (  # noqa: F401
        advanced,
        analytic,
        cdc,
        curation,
        dedup,
        layout,
        multimodal,
        olap,
        olap_full,
        pii,
        relational,
        similarity,
        sourcefmt,
        streaming,
        text,
    )
    from .rotation import rotation_order

    # The driver's correctness harness checks only the FIRST 50 entries of
    # queries() per round, so registration order doubles as the
    # verification rotation: queries with the fewest driver-green rounds
    # sort first (ties broken by original registration order). A new query
    # therefore always enters the next round's checked window, and
    # previously-checked ones cycle back in as slots allow. The per-round
    # checked sets live in rotation.py (appended each round from
    # CORRECTNESS_r{N}.json).
    names = rotation_order(list(_REGISTRY))
    return {name: _REGISTRY[name] for name in names}
