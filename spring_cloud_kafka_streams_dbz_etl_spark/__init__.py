"""spring_cloud_kafka_streams_dbz_etl_spark — a PySpark-native analytics & CDC-ETL engine.

Re-expresses the capabilities of the reference CDC ETL pipeline
(Entea/spring-cloud-kafka-streams-dbz-etl: PostgreSQL -> Debezium -> Kafka ->
Kafka Streams enrichment -> output topics, with DLQ + control plane; see
SURVEY.md) as an idiomatic Spark engine:

- ``operators/``  composable batch DataFrame operators (filter/project/join/
  agg/window/setops, dedup, similarity, text analysis, multimodal plumbing)
- ``sources/``    CDC envelope parsing, Kafka source builders, parquet loaders
- ``functions/``  portable scalar/vector/hash helper expressions
- ``streaming/``  Structured Streaming pipelines (CDC enrich, DLQ split and
  reprocess) and the StreamRegistry control plane (start/stop/status/offsets)
- ``queries/``    the declared query surface: every operator wired to the
  driver test tables with a DuckDB oracle (see ``__spark_entry__.py``)
- ``plans/``      plan-inspection helpers (pushdown / broadcast assertions)

Everything is DataFrame-first: logical plans go through Catalyst, shuffles
are minimized (broadcast joins for dims, single-shuffle aggregations), and
Python appears only in Arrow-batched Pandas UDFs where built-ins cannot
express the semantics.
"""

__version__ = "0.1.0"
