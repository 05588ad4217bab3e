"""Composable curation-pipeline API tests: the config-driven `curate()`
must reproduce the oracled flagship query stage-for-stage, and each
toggle must behave."""

from __future__ import annotations

from pyspark.sql import functions as F

from spring_cloud_kafka_streams_dbz_etl_spark.catalog import table
from spring_cloud_kafka_streams_dbz_etl_spark.operators.curation import (
    CurationConfig,
    curate,
)
from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

SPECS = all_queries()


def test_default_config_matches_flagship_query(spark, sf_smoke):
    """curate() with defaults == q_curation_pipeline (whose semantics are
    DuckDB-oracled), so the composable API inherits the verified result."""
    api = curate(table(spark, sf_smoke, "documents")).collect()
    flagship = SPECS["q_curation_pipeline"].fn(spark, sf_smoke).collect()
    canon = lambda rows: sorted((r.doc_id, round(r.quality, 9), r.split) for r in rows)  # noqa: E731
    assert canon(api) == canon(flagship)


def test_decontaminate_toggle_drops_overlapping_docs(spark, sf_smoke):
    """With a benchmark set, every doc q_decontaminate flags (that
    survives the gates) must be gone from the curated output."""
    docs = table(spark, sf_smoke, "documents")
    bench = docs.filter(F.col("doc_id") < 25)
    corpus = docs.filter(F.col("doc_id") >= 25)
    cfg = CurationConfig(lang_stopword_min=None, quality_min=None)
    out_ids = {r.doc_id for r in curate(corpus, cfg, benchmark=bench).collect()}
    contaminated = {r.doc_id for r in SPECS["q_decontaminate"].fn(spark, sf_smoke).collect()}
    assert contaminated, "smoke corpus should contain contaminated docs"
    assert not (out_ids & contaminated)
    # docs that are neither contaminated nor duplicate text survive
    assert out_ids


def test_toggles_off_and_no_split(spark, sf_smoke):
    docs = table(spark, sf_smoke, "documents")
    cfg = CurationConfig(
        lang_stopword_min=None, quality_min=None, dedup_exact=False, split_bounds=None
    )
    out = curate(docs, cfg)
    assert out.columns == ["doc_id", "quality"]
    assert out.count() == docs.count()  # nothing filtered, nothing deduped


def test_redact_toggle_runs_and_single_plan(spark, sf_smoke):
    """redact=True must compose into the same single declarative plan —
    no extra exchange beyond dedup's one shuffle."""
    from spring_cloud_kafka_streams_dbz_etl_spark.plans import explain_str

    docs = table(spark, sf_smoke, "documents")
    out = curate(docs, CurationConfig(redact=True))
    assert out.count() > 0
    text = explain_str(out, mode="simple")
    assert text.count("Exchange") <= 2, text[:3000]  # dedup agg (+AQE shuffle read)
