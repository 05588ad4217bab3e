"""Declared query surface: name -> (Spark callable, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2B) registers here via the
``@query`` decorator; ``__spark_entry__.py`` re-exports the registry to the
driver. Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = False  # part of the headline bench set


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import for registration side effects (idempotent).
    from . import (  # noqa: F401
        advanced,
        analytic,
        cdc,
        curation,
        dedup,
        multimodal,
        relational,
        similarity,
        sourcefmt,
        streaming,
        text,
    )

    return dict(_REGISTRY)
