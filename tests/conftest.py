from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spring_cloud_kafka_streams_dbz_etl_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
# the largest driver fixture — recall-floor / scale-shape pins run here
SF_SCALE = os.environ.get("SPARK_GRAFT_SCALE_SF", "/root/testdata/sf0.1")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("scksde-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE
