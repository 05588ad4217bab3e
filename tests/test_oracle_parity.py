"""Every oracle-declared query must match DuckDB exactly (driver emulation)."""

from __future__ import annotations

import pytest

from spring_cloud_kafka_streams_dbz_etl_spark.queries import all_queries

from .oracle import compare

SPECS = all_queries()
ORACLE_NAMES = [n for n, s in sorted(SPECS.items()) if s.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    compare(df, spec.oracle, sf_dir, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["id", "user_id", "name", "segment", "event_type", "value", "op"]


def test_rows_only_queries_run(spark, sf_smoke):
    """Queries without an oracle still must run and return a DataFrame."""
    for name, spec in sorted(SPECS.items()):
        if spec.oracle is None:
            df = spec.fn(spark, sf_smoke)
            assert df.count() >= 0, name
