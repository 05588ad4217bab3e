"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual surface lives in ``spring_cloud_kafka_streams_dbz_etl_spark.queries``
(one module per domain, each op registered with its DuckDB oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 'minimum end-to-end slice'): the CDC
    enrichment pipeline in batch form — envelope parse -> latest-wins ->
    broadcast dimension join -> projected output with defaults."""
    from pyspark.sql import functions as F

    from spring_cloud_kafka_streams_dbz_etl_spark.catalog import table
    from spring_cloud_kafka_streams_dbz_etl_spark.operators.relational import (
        enrich_join,
        latest_by_key,
    )
    from spring_cloud_kafka_streams_dbz_etl_spark.session import tune
    from spring_cloud_kafka_streams_dbz_etl_spark.sources.cdc import (
        parse_event_envelopes,
        synthesize_event_envelopes,
    )

    tune(spark)
    ev = table(spark, SMOKE_SF_DIR, "events")
    dim = table(spark, SMOKE_SF_DIR, "customer")
    changes = parse_event_envelopes(synthesize_event_envelopes(ev))
    # Latest event per user: user_id collides (many events per user) and
    # event id is monotone, so this exercises the JPA-@Version / CDC
    # compaction semantics non-degenerately (VERDICT r12 what's-wrong #2 —
    # keying by the unique event id made the dedup a no-op).
    latest = latest_by_key(changes, keys=["user_id"], order_desc=["id"])
    enriched = enrich_join(latest, dim, on=latest.user_id == dim.c_custkey, how="left")
    return enriched.select(
        F.col("id"),
        F.col("user_id"),
        F.coalesce(F.col("c_name"), F.lit("")).alias("name"),
        F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
        F.col("event_type"),
        F.col("value"),
        F.col("op"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
